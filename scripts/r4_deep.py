"""Round-4 deep dense sweep: deep13/14/15 under the restructured kernels.

VERDICT r3 #2/#3: deep13's chooser left a known-better rank config on the
table, and deep14's predicted SPLIT_FOREST could not finish compiling. The
r4 subtree-group-grid fold kernel compiles deep 14/15 in seconds (chip
smoke 9/9); this sweep measures, in ONE session, the candidate configs for
each family across BOTH kernel families so the chooser preferences and the
perf model constants can be re-pinned from fresh data.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=... \
      timeout 5400 python scripts/r4_deep.py > /tmp/r4_deep.out 2>&1
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tahoe_tpu.config import TpuLimits
    from tahoe_tpu.forest import compiler, synthetic
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.ops.fold_kernel import FoldKernelEngine
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    interpret = jax.default_backend() == "cpu"

    def fence(r):
        return float(np.asarray(r).ravel()[0])

    def slope(run_k, k1=2, k2=10, n=3):
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
        return max((t2 - t1) / (k2 - k1), 1e-9)

    results = {}

    def out(tag, v):
        results[tag] = v
        print(json.dumps({tag: v}), flush=True)

    CASES = {
        "deep13": (80, 13, 24, 3000),
        "deep14": (60, 14, 20, 2000),
        "deep15": (30, 15, 16, 1000),
    }
    # (tag, engine kind, kwargs)
    CONFIGS = {
        "deep13": [
            ("rank_auto", "rank", dict(row_tile=128)),
            ("rank_rt64_tt16_ls0", "rank",
             dict(row_tile=64, tree_tile=16, split_level=0)),
            ("rank_rt128_tt8_ls0", "rank",
             dict(row_tile=128, tree_tile=8, split_level=0)),
            ("rank_rt64_tt8_ls0", "rank",
             dict(row_tile=64, tree_tile=8, split_level=0)),
            ("rank_rt128_tt8_ls6", "rank",
             dict(row_tile=128, tree_tile=8, split_level=6)),
            ("fold_auto", "fold", dict(row_tile=64, tree_tile=16)),
            ("fold_rt64_tt16_ls6", "fold",
             dict(row_tile=64, tree_tile=16, split_level=6)),
            ("fold_rt128_tt16_ls6", "fold",
             dict(row_tile=128, tree_tile=16, split_level=6)),
        ],
        "deep14": [
            ("rank_auto", "rank", dict(row_tile=128)),
            ("rank_rt128_tt1_ls8", "rank",
             dict(row_tile=128, tree_tile=1, split_level=8)),
            ("rank_rt256_tt1_ls8", "rank",
             dict(row_tile=256, tree_tile=1, split_level=8)),
            ("fold_auto", "fold", dict(row_tile=64, tree_tile=8)),
            ("fold_rt64_tt8_ls6", "fold",
             dict(row_tile=64, tree_tile=8, split_level=6)),
            ("fold_rt64_tt8_ls7", "fold",
             dict(row_tile=64, tree_tile=8, split_level=7)),
            ("fold_rt128_tt8_ls7", "fold",
             dict(row_tile=128, tree_tile=8, split_level=7)),
        ],
        "deep15": [
            ("rank_auto", "rank", dict(row_tile=128)),
            ("rank_rt128_tt1_ls9", "rank",
             dict(row_tile=128, tree_tile=1, split_level=9)),
            ("fold_auto", "fold", dict(row_tile=64, tree_tile=4)),
            ("fold_rt64_tt4_ls8", "fold",
             dict(row_tile=64, tree_tile=4, split_level=8)),
            ("fold_rt128_tt4_ls8", "fold",
             dict(row_tile=128, tree_tile=4, split_level=8)),
        ],
    }

    for name, (T, D, C, rows) in CASES.items():
        forest = synthetic.generate_forest(T, D, C, seed=1)
        data = synthetic.generate_data(rows, C, missing_prob=0.0, seed=2)
        want = oracle.predict(forest, data)
        data_d = jax.device_put(jnp.asarray(data, jnp.float32))
        lev = None
        for tag, kind, kw in CONFIGS[name]:
            try:
                t0 = time.perf_counter()
                if kind == "rank":
                    eng = RankFoldEngine(forest, interpret=interpret,
                                         limits=TpuLimits(), **kw)
                    info = dict(ls=eng.split_level, tt=eng.tree_tile,
                                rt=eng.row_tile, chunk=eng.stream_chunk_rows)
                else:
                    if lev is None:
                        lev = compiler.levelize(forest)
                    eng = FoldKernelEngine(lev, interpret=interpret, **kw)
                    info = dict(ls=eng.split_level, tt=eng.tree_tile,
                                rt=eng.row_tile)
                err = float(np.abs(
                    np.asarray(eng.predict(data_d)) - want).max())
                compile_s = round(time.perf_counter() - t0, 1)
                if err > 1e-3:
                    out(f"{name}_{tag}", f"PARITY FAIL {err}")
                    continue
                t = slope(lambda k: eng.predict_k(data_d, k))
                us = t * 1e6 / rows
                out(f"{name}_{tag}",
                    [round(us, 4), dict(**info, compile_s=compile_s)])
            except Exception as e:  # noqa: BLE001
                out(f"{name}_{tag}", f"{type(e).__name__}: {str(e)[:160]}")

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
