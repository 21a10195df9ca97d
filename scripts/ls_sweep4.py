"""Round-2 sweep 4: transform row-tile amortization + bigger-Rt split engines
+ sign-form fold validation on real TPU.

Weight-stall model (unit_bench r2): a dot needs M >= ~1024 rows per weight
tile to hide MXU weight loads. The transform ran M = engine row_tile; the
traversal wants big Rt with deep splits to keep fold chains vreg-resident.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
      python scripts/ls_sweep4.py
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
    from tahoe_tpu.forest import compiler, quantize, synthetic
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.ops.fold_kernel import FoldKernelEngine
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

    # ---- A. transform row tile sweep (engine fixed at ls4/rt1024) ----
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
            if trt == 4096:
                err = float(np.abs(np.asarray(eng.predict(data_d)) - want).max())
                out("err_trt4096", err)
        except Exception as e:
            out(f"full_trt{trt}", f"{type(e).__name__}: {e}")

    # ---- B. bigger-Rt split engine configs (planes timing) ----
    def planes_chain(eng, planes):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(tables, pl_, k):
            def body(_, acc):
                pp = pl_ + (acc[:1, None] * 0).astype(jnp.int8)
                return eng._margins_planes(tables, pp)

            return jax.lax.fori_loop(
                0, k, body, jnp.zeros(pl_.shape[0], jnp.float32))

        return lambda k: run(eng.tables, planes, k)

    planes_big = None
    for tag, kw in [
        ("p64k_ls4_rt1024_tt128", dict(row_tile=1024, tree_tile=128,
                                       split_level=4)),
        ("p64k_ls4_rt2048_tt32", dict(row_tile=2048, tree_tile=32,
                                      split_level=4)),
        ("p64k_ls5_rt2048_tt32", dict(row_tile=2048, tree_tile=32,
                                      split_level=5)),
        ("p64k_ls5_rt2048_tt64", dict(row_tile=2048, tree_tile=64,
                                      split_level=5)),
        ("p64k_ls4_rt4096_tt16", dict(row_tile=4096, tree_tile=16,
                                      split_level=4)),
        ("p64k_ls5_rt4096_tt32", dict(row_tile=4096, tree_tile=32,
                                      split_level=5)),
    ]:
        try:
            eng = RankFoldEngine(forest, interpret=interpret,
                                 limits=TpuLimits(), **kw)
            if planes_big is None:
                planes_big = jax.device_put(jnp.asarray(
                    quantize.encode_rank_planes_np(
                        quantize.transform_rows_np(eng.q, data_big))))
            t, _ = slope(planes_chain(eng, planes_big))
            out(tag, round(t * 1e6 / rows_big, 6))
        except Exception as e:
            out(tag, f"{type(e).__name__}: {e}")

    # ---- C. sign-form fold on REAL TPU: compile + parity + speed ----
    rng = np.random.default_rng(3)
    for active, cols in ((100, 100), (300, 900)):
        f2 = synthetic.generate_forest(200, 6, active, seed=3)
        if cols > active:
            colmap = np.sort(rng.choice(cols, size=active, replace=False))
            f2.fids = colmap[f2.fids].astype(np.int32)
            f2.num_cols = cols
        d2 = synthetic.generate_data(16384, cols, missing_prob=0.02, seed=4)
        w2 = oracle.predict(f2, d2)
        d2d = jax.device_put(jnp.asarray(d2, jnp.float32))
        for mode, kw in (("sign", dict(ge_mode=True)),
                         ("nonge", dict(ge_mode=False))):
            if mode == "nonge" and cols > 128:
                continue
            try:
                eng = FoldKernelEngine(
                    compiler.levelize(f2), row_tile=256, tree_tile=128,
                    interpret=interpret, **kw)
                err = float(np.abs(np.asarray(eng.predict(d2d)) - w2).max())
                t, _ = slope(lambda k: eng.predict_k(d2d, k))
                out(f"fold_{mode}_a{active}_c{cols}",
                    [round(t * 1e6 / 16384, 6), err])
            except Exception as e:
                out(f"fold_{mode}_a{active}_c{cols}",
                    f"{type(e).__name__}: {e}")

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
