"""Round-2 session-2 sweep 1: headline configs, same-session comparison.

Full-predict rank-MXU at 16k and 64k rows x transform row tiles; planes
reference; fold baseline.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
      python scripts/r2s2_sweep1.py
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tahoe_tpu.config import TpuLimits
    from tahoe_tpu.forest import quantize, synthetic
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    interpret = jax.default_backend() == "cpu"
    forest = synthetic.susy_class_forest(seed=0)
    rows = 16384
    data = synthetic.generate_data(rows, 18, missing_prob=0.02, seed=1)
    data_d = jax.device_put(jnp.asarray(data, jnp.float32))
    rows_big = 65536
    data_big = synthetic.generate_data(rows_big, 18, missing_prob=0.02, seed=2)
    data_big_d = jax.device_put(jnp.asarray(data_big, jnp.float32))
    want = oracle.predict(forest, data)

    def fence(r):
        return float(np.asarray(r).ravel()[0])

    def slope(run_k, k1=3, k2=19, n=3):
        def timed(k):
            fence(run_k(k))
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                fence(run_k(k))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        t1, t2 = timed(k1), timed(k2)
        tries = 0
        while (t2 - t1) < 0.02 and tries < 5:
            k2 = k1 + (k2 - k1) * max(2, int(0.04 / max(t2 - t1, 1e-3)))
            t2 = timed(k2)
            tries += 1
        return max((t2 - t1) / (k2 - k1), 1e-9), k2

    results = {}

    def out(tag, v):
        results[tag] = v
        print(json.dumps({tag: v}), flush=True)

    def planes_chain(eng, planes):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(tables, pl_, k):
            def body(_, acc):
                pp = pl_ + (acc[:1, None] * 0).astype(jnp.int8)
                return eng._margins_planes(tables, pp)

            return jax.lax.fori_loop(
                0, k, body, jnp.zeros(pl_.shape[0], jnp.float32))

        return lambda k: run(eng.tables, planes, k)

    # ---- A. full predict: trt sweep x batch size (engine ls4/rt1024/tt128)
    for trt in (1024, 2048, 4096, 8192):
        try:
            eng = RankFoldEngine(
                forest, row_tile=1024, tree_tile=128, split_level=4,
                interpret=interpret, transform_row_tile=trt,
                limits=TpuLimits(),
            )
            t, _ = slope(lambda k: eng.predict_k(data_d, k))
            out(f"full16k_trt{trt}", round(t * 1e6 / rows, 6))
            t, _ = slope(lambda k: eng.predict_k(data_big_d, k))
            out(f"full64k_trt{trt}", round(t * 1e6 / rows_big, 6))
            if trt == 1024:
                # same-engine planes numbers for the transform-cost split
                pl16 = jax.device_put(jnp.asarray(
                    quantize.encode_rank_planes_np(
                        quantize.transform_rows_np(eng.q, data))))
                t, _ = slope(planes_chain(eng, pl16))
                out("planes16k", round(t * 1e6 / rows, 6))
                pl64 = jax.device_put(jnp.asarray(
                    quantize.encode_rank_planes_np(
                        quantize.transform_rows_np(eng.q, data_big))))
                t, _ = slope(planes_chain(eng, pl64))
                out("planes64k", round(t * 1e6 / rows_big, 6))
                err = float(np.abs(np.asarray(eng.predict(data_d)) - want).max())
                out("err_trt1024", err)
        except Exception as e:
            out(f"full_trt{trt}", f"{type(e).__name__}: {e}")

    # ---- B. full predict 64k: a couple of engine tile variants ----
    for tag, kw in [
        ("full64k_ls4_rt2048_tt32", dict(row_tile=2048, tree_tile=32,
                                         split_level=4,
                                         transform_row_tile=4096)),
        ("full64k_ls5_rt2048_tt64", dict(row_tile=2048, tree_tile=64,
                                         split_level=5,
                                         transform_row_tile=4096)),
        ("full64k_ls0_rt256_tt128", dict(row_tile=256, tree_tile=128,
                                         split_level=0,
                                         transform_row_tile=4096)),
    ]:
        try:
            eng = RankFoldEngine(forest, interpret=interpret,
                                 limits=TpuLimits(), **kw)
            t, _ = slope(lambda k: eng.predict_k(data_big_d, k))
            out(tag, round(t * 1e6 / rows_big, 6))
        except Exception as e:
            out(tag, f"{type(e).__name__}: {e}")

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
