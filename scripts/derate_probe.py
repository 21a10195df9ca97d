"""Map the G=3 split-mode VMEM estimate-vs-actual boundary at Db = 6.

The x2 split-budget derate comes from ONE r1 data point (est 39.9 MiB ->
actual 97.3 scoped OOM, config unknown, likely Db = 7). Today's
rt512/tt4/ls8 (est 31.5, Db = 6) compiled and ran fine. If Db = 6 G = 3
estimates track actuals, the derate can be conditioned on Db and the
chooser gains deep14 2.18 (or better) by default. Each config: build +
compile + parity + slope; scoped OOMs fail cleanly and are recorded.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=... \
      timeout 4800 python scripts/derate_probe.py > /tmp/derate.out 2>&1
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
    # (family, tag, kwargs, vmem_fraction) — all Db = 6 except noted
    CONFIGS = [
        ("deep14", "rt512_tt8_ls8", dict(row_tile=512, tree_tile=8,
                                         split_level=8), 1.2),
        ("deep14", "rt1024_tt4_ls8", dict(row_tile=1024, tree_tile=4,
                                          split_level=8), 1.7),
        ("deep15", "rt512_tt1_ls9", dict(row_tile=512, tree_tile=1,
                                         split_level=9), 1.2),
        ("deep15", "rt1024_tt1_ls9", dict(row_tile=1024, tree_tile=1,
                                          split_level=9), 1.7),
    ]

    forests = {}
    for name, (T, D, C, rows) in CASES.items():
        f = synthetic.generate_forest(T, D, C, seed=1)
        d = synthetic.generate_data(rows, C, missing_prob=0.0, seed=2)
        forests[name] = (f, d, oracle.predict(f, d),
                         jax.device_put(jnp.asarray(d, jnp.float32)), rows)

    for name, tag, kw, frac in CONFIGS:
        f, d, want, d_dev, rows = forests[name]
        try:
            t0 = time.perf_counter()
            eng = RankFoldEngine(f, interpret=interpret,
                                 limits=TpuLimits(vmem_fraction=frac), **kw)
            est = eng.vmem_bytes(f.depth, eng.row_tile, eng.tree_tile,
                                 eng.groups, eng.split_level) / 2**20
            err = float(np.abs(np.asarray(eng.predict(d_dev)) - want).max())
            compile_s = round(time.perf_counter() - t0, 1)
            if err > 1e-3:
                out(f"{name}_{tag}", f"PARITY FAIL {err}")
                continue
            t = slope(lambda k: eng.predict_k(d_dev, k))
            us = t * 1e6 / rows
            out(f"{name}_{tag}",
                [round(us, 4), dict(est_mib=round(est, 1),
                                    chunk=eng.stream_chunk_rows,
                                    compile_s=compile_s)])
        except Exception as e:  # noqa: BLE001
            out(f"{name}_{tag}", f"{type(e).__name__}: {str(e)[:200]}")

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
