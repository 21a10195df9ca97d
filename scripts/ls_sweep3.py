"""Refinement sweep around ls4_rt512_tt128 (winner of ls_sweep2) + 64k rows.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
      python scripts/ls_sweep3.py
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
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    interpret = jax.default_backend() == "cpu"
    forest = synthetic.susy_class_forest(seed=0)
    rows = 16384
    data = synthetic.generate_data(rows, 18, missing_prob=0.02, seed=1)
    data_d = jax.device_put(jnp.asarray(data, jnp.float32))
    rows_big = 65536
    data_big = synthetic.generate_data(rows_big, 18, missing_prob=0.02, seed=2)
    data_big_d = jax.device_put(jnp.asarray(data_big, jnp.float32))

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

    def planes_chain(eng, planes):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(tables, pl_, k):
            def body(_, acc):
                pp = pl_ + (acc[:1, None] * 0).astype(jnp.int8)
                return eng._margins_planes(tables, pp)

            return jax.lax.fori_loop(
                0, k, body, jnp.zeros(pl_.shape[0], jnp.float32))

        return lambda k: run(eng.tables, planes, k)

    def measure(tag, big=False, full=False, **kw):
        try:
            eng = RankFoldEngine(forest, interpret=interpret,
                                 limits=TpuLimits(), **kw)
        except Exception as e:
            results[tag] = f"build: {type(e).__name__}: {e}"
            print(json.dumps({tag: results[tag]}), flush=True)
            return
        d, dd, r = (data_big, data_big_d, rows_big) if big else (
            data, data_d, rows)
        try:
            planes = jax.device_put(jnp.asarray(
                quantize.encode_rank_planes_np(
                    quantize.transform_rows_np(eng.q, d))))
            t, _ = slope(planes_chain(eng, planes))
            results[tag] = round(t * 1e6 / r, 6)
            if full:
                t, _ = slope(lambda k: eng.predict_k(dd, k))
                results[tag + "_full"] = round(t * 1e6 / r, 6)
        except Exception as e:
            results[tag] = f"run: {type(e).__name__}: {e}"
        print(json.dumps({k: v for k, v in results.items()
                          if k.startswith(tag)}), flush=True)

    # control + winner (re-measure same-session)
    measure("ls0_rt256_tt128", row_tile=256, tree_tile=128, full=True)
    measure("ls4_rt512_tt128_ch1024", row_tile=512, tree_tile=128,
            split_level=4, col_chunk=1024, full=True)

    for tag, kw in [
        ("ls3_rt512_tt128_ch1024", dict(row_tile=512, split_level=3)),
        ("ls5_rt512_tt128_ch1024", dict(row_tile=512, split_level=5)),
        ("ls4_rt512_tt128_ch512", dict(row_tile=512, split_level=4,
                                       col_chunk=512)),
        ("ls4_rt512_tt128_ch2048", dict(row_tile=512, split_level=4,
                                        col_chunk=2048)),
        ("ls4_rt1024_tt128_ch1024", dict(row_tile=1024, split_level=4)),
        ("ls5_rt1024_tt128_ch1024", dict(row_tile=1024, split_level=5)),
        ("ls4_rt512_tt64_ch1024", dict(row_tile=512, tree_tile=64,
                                       split_level=4)),
        ("ls6_rt512_tt128_ch1024", dict(row_tile=512, split_level=6)),
    ]:
        kw.setdefault("tree_tile", 128)
        measure(tag, **kw)

    # 64k rows on the top configs
    measure("big_ls4_rt512_tt128", row_tile=512, tree_tile=128,
            split_level=4, big=True, full=True)
    measure("big_ls4_rt1024_tt128", row_tile=1024, tree_tile=128,
            split_level=4, big=True, full=True)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
