"""SUSY-class rank-kernel config sweep (one process, same-session numbers).

Round-2 follow-up to scripts/unit_bench.py, which showed the whole-level
kernel runs at ~16% of the chip's raw int8 MXU rate and is dominated by
VMEM traffic (int32 diff spills + f32 w chains). Sweeps:
  - whole-level: row_tile x tree_tile x col_chunk
  - subtree-split: split_level (keeps fold chains vreg-resident) x col_chunk
plane-resident margins timing (the kernel in isolation); best config also
measured full-predict.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
      python scripts/ls_sweep2.py [--rows 16384]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=16384)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tahoe_tpu.config import TpuLimits
    from tahoe_tpu.forest import quantize, synthetic
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    interpret = jax.default_backend() == "cpu"
    forest = synthetic.susy_class_forest(seed=0)
    rows = args.rows
    data = synthetic.generate_data(rows, 18, missing_prob=0.02, seed=1)
    data_d = jax.device_put(jnp.asarray(data, jnp.float32))

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

    def measure(tag, **kw):
        try:
            eng = RankFoldEngine(forest, interpret=interpret,
                                 limits=TpuLimits(), **kw)
        except Exception as e:
            results[tag] = f"build: {type(e).__name__}: {e}"
            print(json.dumps({tag: results[tag]}), flush=True)
            return None
        planes = jax.device_put(jnp.asarray(quantize.encode_rank_planes_np(
            quantize.transform_rows_np(eng.q, data))))
        try:
            t, _ = slope(planes_chain(eng, planes))
        except Exception as e:
            results[tag] = f"run: {type(e).__name__}: {e}"
            print(json.dumps({tag: results[tag]}), flush=True)
            return None
        us = t * 1e6 / rows
        results[tag] = round(us, 6)
        print(json.dumps({tag: results[tag]}), flush=True)
        return us

    # control first (the current default)
    measure("ls0_rt256_tt128_ch1024", row_tile=256, tree_tile=128)

    # whole-level variants
    for rt, tt, ch in [(256, 128, 512), (256, 128, 2048),
                       (512, 64, 1024), (512, 64, 512),
                       (256, 64, 1024), (128, 128, 1024),
                       (512, 32, 1024), (1024, 32, 1024)]:
        measure(f"ls0_rt{rt}_tt{tt}_ch{ch}", row_tile=rt, tree_tile=tt,
                col_chunk=ch, split_level=0)

    # subtree-split variants (vreg-resident bottom folds)
    for ls in (2, 3, 4, 5):
        for ch in (512, 1024):
            measure(f"ls{ls}_rt256_tt128_ch{ch}", row_tile=256, tree_tile=128,
                    split_level=ls, col_chunk=ch)
    measure("ls4_rt512_tt128_ch1024", row_tile=512, tree_tile=128,
            split_level=4)
    measure("ls4_rt256_tt128_ch1024_nostream", row_tile=256, tree_tile=128,
            split_level=4, stream_once=False)

    # best config full predict + parity
    numeric = {k: v for k, v in results.items() if isinstance(v, float)}
    best = min(numeric, key=numeric.get)
    results["best"] = best

    def parse(tag):
        kw = {}
        for part in tag.split("_"):
            if part.startswith("ls"):
                kw["split_level"] = int(part[2:])
            elif part.startswith("rt"):
                kw["row_tile"] = int(part[2:])
            elif part.startswith("tt"):
                kw["tree_tile"] = int(part[2:])
            elif part.startswith("ch"):
                kw["col_chunk"] = int(part[2:])
            elif part == "nostream":
                kw["stream_once"] = False
        return kw

    eng = RankFoldEngine(forest, interpret=interpret, limits=TpuLimits(),
                         **parse(best))
    t, _ = slope(lambda k: eng.predict_k(data_d, k))
    results["best_full_us"] = round(t * 1e6 / rows, 6)
    from tahoe_tpu.ops import oracle

    want = oracle.predict(forest, data)
    err = float(np.abs(np.asarray(eng.predict(data_d)) - want).max())
    results["best_max_err"] = err

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
