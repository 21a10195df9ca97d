#!/usr/bin/env python
"""Multi-chip scaling benchmark/validation.

BASELINE config 5: multi-host batch-sharded inference with psum of per-tree
margins over ICI, target >=85% throughput scaling efficiency. On a real
multi-chip slice this script measures it (slope-timed, per device count); on
a single-chip or CPU environment it falls back to functional validation on
virtual CPU devices (sharding compiles + executes + matches the oracle),
which is what this repo's CI environment supports — the measurement path is
the same code.

Multi-host usage (one process per host):
  python scripts/run_scaling.py --coordinator HOST:PORT --nprocs N --pid I
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None)
    p.add_argument("--nprocs", type=int, default=None)
    p.add_argument("--pid", type=int, default=None)
    p.add_argument("--rows-per-device", type=int, default=8192)
    p.add_argument("--virtual-devices", type=int, default=8,
                   help="CPU fallback mesh size")
    args = p.parse_args()

    import jax

    if args.nprocs and args.nprocs > 1:
        from tahoe_tpu.parallel.mesh import init_distributed

        init_distributed(args.coordinator, args.nprocs, args.pid)

    # Virtual-CPU fallback must be decided BEFORE any backend initializes
    # (XLA_FLAGS is read once); re-exec with the right env when needed.
    simulated = os.environ.get("TAHOE_SCALING_SIMULATED") == "1"
    if not simulated:
        n_real = len(jax.devices())
        if n_real < 2:
            env = dict(os.environ)
            env["TAHOE_SCALING_SIMULATED"] = "1"
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "").replace(
                    "--xla_force_host_platform_device_count=8", ""
                )
                + f" --xla_force_host_platform_device_count={args.virtual_devices}"
            ).strip()
            env.pop("PALLAS_AXON_POOL_IPS", None)
            os.execve(sys.executable, [sys.executable] + sys.argv, env)

    import jax.numpy as jnp

    from tahoe_tpu.forest import compiler, synthetic
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.parallel.mesh import make_mesh
    from tahoe_tpu.parallel.sharded import ShardedForestEngine, batch_sharded_put
    from tahoe_tpu.utils.profiling import slope_time

    devices = jax.devices()
    n = len(devices)
    depth, cols = (8, 18) if not simulated else (4, 10)
    trees = 512 if not simulated else 32
    forest = synthetic.generate_forest(trees, depth, cols, seed=1)
    lev = compiler.levelize(forest)

    results = {"devices": n, "simulated": simulated, "points": []}
    # interpret-mode Pallas on CPU is slow; validate two mesh sizes only
    counts = [c for c in ((1, 2, 4, 8, 16, 32) if not simulated else (1, 2))
              if c <= n]
    base_rate = None
    for c in counts:
        mesh = make_mesh(data=c, model=1, devices=devices[:c])
        rows = args.rows_per_device * c if not simulated else 32 * c
        data = synthetic.generate_data(rows, cols, seed=2)
        eng = ShardedForestEngine(
            lev, mesh,
            row_tile=256 if not simulated else 8,
            tree_tile=64 if not simulated else 8,
        )
        data_sharded = batch_sharded_put(data, mesh)
        # functional check (always)
        preds = np.asarray(eng.predict(data_sharded))
        err = float(np.abs(preds - oracle.predict(forest, data)).max())
        point = {"chips": c, "rows": rows, "max_err": err, "correct": err <= 1e-3}
        if not simulated:
            import functools

            @functools.partial(jax.jit, static_argnames=("k",))
            def run_k(tables, d, k):
                def body(_, acc):
                    return eng._predict_impl(tables, d + acc[0] * 0.0)

                return jax.lax.fori_loop(0, k, body,
                                         jnp.zeros(d.shape[0], jnp.float32))

            t = slope_time(lambda k: run_k(eng.tables, data_sharded, k))
            rate = rows / t
            point["rows_per_s"] = rate
            if base_rate is None:
                base_rate = rate
            point["scaling_efficiency"] = rate / (base_rate * c)
        results["points"].append(point)
        print(json.dumps(point), flush=True)

    ok = all(pt["correct"] for pt in results["points"])
    if not simulated and len(results["points"]) > 1:
        eff = results["points"][-1].get("scaling_efficiency", 0)
        print(f"scaling efficiency at {counts[-1]} chips: {eff:.1%}", flush=True)
    print(json.dumps(results), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
