"""Transform-row-tile sweep for the bench config, rank engine first-in-process
(the device caches only the first large executable), full predict, 3 slopes
per config. Settles whether r3_headline's trt4096 = 0.0986 was drift or real.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=... \
      timeout 2400 python scripts/trt_sweep.py --trt N > /tmp/trt_N.out
One process per trt value (first-executable discipline).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--trt", type=int, required=True)
    p.add_argument("--rows", type=int, default=65536)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tahoe_tpu.config import TpuLimits
    from tahoe_tpu.forest import synthetic
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    interpret = jax.default_backend() == "cpu"
    forest = synthetic.susy_class_forest(seed=0)
    rows = args.rows
    data = synthetic.generate_data(rows, 18, missing_prob=0.02, seed=1)
    data_d = jax.device_put(jnp.asarray(data, jnp.float32))

    def fence(r):
        return float(np.asarray(r).ravel()[0])

    def slope(run_k, k1=3, k2=27, n=3):  # bench.py's k values → cache reuse
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

    eng = RankFoldEngine(forest, row_tile=1024, tree_tile=128, split_level=4,
                         col_chunk=1024, transform_row_tile=args.trt,
                         interpret=interpret, limits=TpuLimits())
    want = oracle.predict(forest, data)
    err = float(np.abs(np.asarray(eng.predict(data_d)) - want).max())
    slopes = sorted(
        round(slope(lambda k: eng.predict_k(data_d, k)) * 1e6 / rows, 6)
        for _ in range(3)
    )
    print(json.dumps({"trt": args.trt, "err": err,
                      "full_us_median": slopes[1], "band": [slopes[0],
                                                            slopes[2]]}),
          flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
