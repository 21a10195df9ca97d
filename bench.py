"""Headline benchmark: SUSY-class per-sample latency on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": <us/sample>, "unit": "us/sample", "vs_baseline": N}

vs_baseline is the speedup over the reference's best published SUSY number
(strategy 3, 0.120020 us/sample on its GPU — BASELINE.md): >1.0 means this
framework is faster than Tahoe's best strategy on its own headline benchmark.

Methodology mirrors the reference (BaseTahoeTest.h:684-698): data uploaded
once, warmup + timed epochs, correctness gate vs the CPU oracle at 1e-3 —
with the timing done as a chained-iteration slope (k dependent predicts
inside one jit, one host fence), because the remote TPU runtime acks
dispatches before execution completes. Runs exactly one engine in this
process (the axon runtime only device-caches the first large executable —
see .claude/skills/verify/SKILL.md).
"""
import argparse
import json
import sys
import time

import numpy as np

REFERENCE_BEST_US = 0.120020  # Tahoe strategy 3 on SUSY, README.md:66-67


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=16384)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--quick", action="store_true", help="3 epochs, 4096 rows")
    args = p.parse_args()
    if args.quick:
        args.rows, args.epochs, args.warmup = 4096, 3, 1

    import jax
    import jax.numpy as jnp

    from tahoe_tpu.forest import compiler, synthetic
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.ops.fold_kernel import FoldKernelEngine

    forest = synthetic.susy_class_forest(seed=0)  # 500 trees, depth 8, 18 cols
    data = synthetic.generate_data(args.rows, 18, missing_prob=0.02, seed=1)
    lev = compiler.levelize(forest)
    eng = FoldKernelEngine(
        lev, row_tile=256, tree_tile=64,
        interpret=jax.default_backend() == "cpu",
    )

    from tahoe_tpu.engine.bench_worker import timed_epoch_seconds

    data_d = jax.device_put(jnp.asarray(data))
    dt = timed_epoch_seconds(eng, data_d, warmup=args.warmup, epochs=args.epochs)
    us_per_sample = dt * 1e6 / args.rows

    preds = eng.predict(data_d)
    err = float(np.abs(np.asarray(preds) - oracle.predict(forest, data)).max())
    if err > 1e-3:
        print(json.dumps({"metric": "SUSY-class per-sample latency",
                          "value": None, "unit": "us/sample",
                          "vs_baseline": 0.0, "error": f"parity {err}"}))
        return 1

    print(json.dumps({
        "metric": "SUSY-class (500 trees, depth 8, 18 feat) per-sample latency",
        "value": round(us_per_sample, 6),
        "unit": "us/sample",
        "vs_baseline": round(REFERENCE_BEST_US / us_per_sample, 2),
        "max_err_vs_oracle": err,
        "rows": args.rows,
        "epochs": args.epochs,
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
