"""Round-4 deep sweep, batch 3: higher split levels + loose-budget rows.

Batch 2 pinned deep14 = rank rt256/tt4/ls8 2.27 and deep15 = rt256/tt1
(auto ls0) 2.23-2.37. Untried: ls9/ls10 (smaller streamed bottom slabs +
smaller w_live; more top levels resident) and rt512 under a loosened
budget (the G>=2 x2 derate is calibrated on ls<=8 shapes; Mosaic
arbitrates the real compile — a scoped OOM fails cleanly).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=... \
      timeout 4800 python scripts/r4_deep3.py > /tmp/r4_deep3.out 2>&1
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tahoe_tpu.config import TpuLimits
    from tahoe_tpu.forest import synthetic
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    interpret = jax.default_backend() == "cpu"
    loose = TpuLimits(vmem_fraction=1.2)

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
        "deep14": (60, 14, 20, 2000),
        "deep15": (30, 15, 16, 1000),
    }
    CONFIGS = {
        "deep14": [
            ("rank_rt256_tt4_ls9", dict(row_tile=256, tree_tile=4,
                                        split_level=9)),
            ("rank_rt256_tt4_ls10", dict(row_tile=256, tree_tile=4,
                                         split_level=10)),
            ("rank_rt512_tt4_ls9_loose", dict(row_tile=512, tree_tile=4,
                                              split_level=9, limits=loose)),
            ("rank_rt512_tt4_ls8_loose", dict(row_tile=512, tree_tile=4,
                                              split_level=8, limits=loose)),
        ],
        "deep15": [
            ("rank_rt256_tt1_ls10", dict(row_tile=256, tree_tile=1,
                                         split_level=10)),
            ("rank_rt512_tt1_ls10_loose", dict(row_tile=512, tree_tile=1,
                                               split_level=10,
                                               limits=loose)),
        ],
    }

    for name, (T, D, C, rows) in CASES.items():
        forest = synthetic.generate_forest(T, D, C, seed=1)
        data = synthetic.generate_data(rows, C, missing_prob=0.0, seed=2)
        want = oracle.predict(forest, data)
        data_d = jax.device_put(jnp.asarray(data, jnp.float32))
        for tag, kw in CONFIGS[name]:
            try:
                kw = dict(kw)
                limits = kw.pop("limits", TpuLimits())
                t0 = time.perf_counter()
                eng = RankFoldEngine(forest, interpret=interpret,
                                     limits=limits, **kw)
                info = dict(ls=eng.split_level, tt=eng.tree_tile,
                            rt=eng.row_tile, chunk=eng.stream_chunk_rows)
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
