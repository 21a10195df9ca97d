"""Chip smoke + A/B for the fused transform+traversal kernel (r4).

Headline config (rt2048/ls4/cc2048), 65536 rows, same session:
  - fused vs unfused full predict (medians-of-3, bands)
  - parity vs the CPU oracle and bit-parity fused vs unfused

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=... \
      timeout 3600 python scripts/fused_smoke.py > /tmp/fused.out 2>&1
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
    rows = 65536 if not interpret else 2048
    forest = synthetic.susy_class_forest(seed=0)
    data = synthetic.generate_data(rows, 18, missing_prob=0.02, seed=1)
    data_d = jax.device_put(jnp.asarray(data, jnp.float32))
    want = oracle.predict(forest, data)

    results = {}

    def out(tag, v):
        results[tag] = v
        print(json.dumps({tag: v}), flush=True)

    def fence(r):
        return float(np.asarray(r).ravel()[0])

    def slope(run_k, k1=3, k2=27, n=3):
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

    def med3(run_k):
        ts = sorted(slope(run_k) for _ in range(3))
        return [round(t * 1e6 / rows, 6) for t in (ts[1], ts[0], ts[2])]

    kw = dict(row_tile=2048, tree_tile=128, split_level=4, col_chunk=2048,
              transform_row_tile=2048, interpret=interpret,
              limits=TpuLimits())
    fused = RankFoldEngine(forest, **kw)
    out("fuse_eligible", bool(fused._fuse))
    pf = np.asarray(fused.predict(data_d))
    out("fused_parity_err", float(np.abs(pf - want).max()))
    m = med3(lambda k: fused.predict_k(data_d, k))
    out("fused_full", {"us": m[0], "band": m[1:]})

    unf = RankFoldEngine(forest, fuse_transform=False, **kw)
    pu = np.asarray(unf.predict(data_d))
    out("bit_identical", bool(np.array_equal(pf, pu)))
    m = med3(lambda k: unf.predict_k(data_d, k))
    out("unfused_full", {"us": m[0], "band": m[1:]})

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
