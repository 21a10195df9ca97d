"""Sparse kernel chunk-width tune: the loop-structured kernel (r3) measured
0.906 us/sample on rf_deep16 where the unrolled r2 kernel did 0.284 — the
per-chunk fori_loop/cond/scalar overhead dominates at CH=8 on small resident
pools. Wider chunks amortize it (statements stay O(CH), far below the wall).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=... \
      timeout 2400 python scripts/sparse_tune.py > /tmp/sparse_tune.out
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
    from tahoe_tpu.forest.train import train_forest
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.ops.sparse_kernel import SparseRankEngine

    interpret = jax.default_backend() == "cpu"

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
        return max((t2 - t1) / (k2 - k1), 1e-9)

    results = {}

    def out(tag, v):
        results[tag] = v
        print(json.dumps({tag: v}), flush=True)

    cases = [
        ("rf16", train_forest(120, 16, 20, rows=2048, seed=1), 1500),
        ("rf18", train_forest(200, 18, 24, rows=2048, seed=1), 1500),
    ]
    for name, forest, rows in cases:
        data = synthetic.generate_data(rows, forest.num_cols,
                                       missing_prob=0.0, seed=2)
        want = oracle.predict(forest, data)
        data_d = jax.device_put(jnp.asarray(data, jnp.float32))
        import os
        _ccs = (1024,) if os.environ.get('CC1024_ONLY') else (1024, 2048, 4096)
        for cc in _ccs:
            for rt in ((256, 512) if cc == 2048 else (256,)):
                tag = f"{name}_cc{cc}_rt{rt}"
                try:
                    eng = SparseRankEngine(forest, row_tile=rt, col_chunk=cc,
                                           limits=TpuLimits(),
                                           interpret=interpret)
                    err = float(np.abs(
                        np.asarray(eng.predict(data_d)) - want).max())
                    t = slope(lambda k: eng.predict_k(data_d, k))
                    out(tag, [round(t * 1e6 / rows, 4), err,
                              {"resident": eng.resident,
                               "slots": sum(eng.lv.widths),
                               "K": eng.macro_chunks}])
                    del eng
                except Exception as e:
                    out(tag, f"{type(e).__name__}: {str(e)[:150]}")

    print(json.dumps({"ALL": results}), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
