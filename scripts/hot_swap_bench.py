"""Hot-child-swap A/B measurement (VERDICT r2 next-round #6).

The reference swaps each split's children so the hotter (higher training
weight) child sits on a fixed side, recording an exchange bit
(Struct.h:1712-1825), for SIMT branch coherence. On TPU every engine is
branchless (masked folds / gathers), so the pass's value must be measured,
not assumed: this script times the gather path (HBM_DIRECT — the one engine
that consumes the swapped+exchange format) and the fold kernel on
swapped-leveled vs raw-leveled tables, same session, same data.

If no configuration shows a win, the pass is format-compatibility only
(docs/design.md gets the verdict either way).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=... \
      timeout 1800 python scripts/hot_swap_bench.py > /tmp/hot_swap.out
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tahoe_tpu.forest import compiler, synthetic
    from tahoe_tpu.forest.train import train_forest
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.ops.fold_kernel import FoldKernelEngine
    from tahoe_tpu.ops.gather_engine import GatherEngine

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
        ("susy", synthetic.susy_class_forest(seed=0), 16384, 0.02),
        ("rf_trained", train_forest(300, 10, 24, rows=2048, seed=1),
         8192, 0.01),
    ]
    for name, forest, rows, mp in cases:
        data = synthetic.generate_data(rows, forest.num_cols,
                                       missing_prob=mp, seed=2)
        data_d = jax.device_put(jnp.asarray(data, jnp.float32))
        want = oracle.predict(forest, data)

        swapped = compiler.hot_child_swap(forest)

        # gather path: the engine that actually consumes exchange bits
        for tag, spec in (("raw", forest), ("swapped", swapped)):
            eng = GatherEngine(spec)
            err = float(np.abs(np.asarray(eng.predict(data_d)) - want).max())
            t = slope(lambda k: eng.predict_k(data_d, k))
            out(f"{name}_gather_{tag}_us", round(t * 1e6 / rows, 6))
            out(f"{name}_gather_{tag}_err", err)
            del eng

        # fold kernel: swapped-leveled (exchange folded into compare sense)
        # vs raw-leveled tables
        for tag, spec in (("raw", forest), ("swapped", swapped)):
            try:
                eng = FoldKernelEngine(compiler.levelize(spec), row_tile=128,
                                       tree_tile=128, interpret=interpret)
                err = float(
                    np.abs(np.asarray(eng.predict(data_d)) - want).max())
                t = slope(lambda k: eng.predict_k(data_d, k))
                out(f"{name}_fold_{tag}_us", round(t * 1e6 / rows, 6))
                out(f"{name}_fold_{tag}_err", err)
                del eng
            except Exception as e:
                out(f"{name}_fold_{tag}_us", f"{type(e).__name__}: {e}")

    print(json.dumps({"ALL": results}), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
