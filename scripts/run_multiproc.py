#!/usr/bin/env python
"""Multi-process (multi-host analog) validation of the distributed layer.

Launches 2 JAX processes x 4 virtual CPU devices each (the CI-environment
stand-in for 2 hosts x 4 chips; jax.distributed + gloo collectives — the same
code path as real multi-host TPU, with DCN swapped for localhost TCP), builds
the (data=4, model=2) mesh over all 8 GLOBAL devices, and runs BOTH sharded
engines end-to-end:

- ShardedForestEngine (f32 fold, trees sharded over "model", one psum)
- ShardedRankEngine  (int8 rank-MXU, same psum pattern)

Input rows enter through ``jax.make_array_from_process_local_data`` (each
process contributes only its own rows — the real multi-host input path,
BASELINE config 5); node tables enter through ``make_array_from_callback``
with their tree shards placed on the "model" axis. Every process checks its
addressable output shards against the CPU oracle; process 0 writes
MULTIPROC_r02.json.

Usage (single command — it self-launches the 2 workers):
  python scripts/run_multiproc.py
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

PORT = 12731


def worker(pid: int, nprocs: int) -> int:
    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=nprocs,
        process_id=pid,
    )
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tahoe_tpu.forest import compiler, synthetic
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.parallel.mesh import make_mesh
    from tahoe_tpu.parallel.sharded import (
        ShardedForestEngine,
        ShardedRankEngine,
    )

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 8 and n_local == 4, (n_global, n_local)
    n_data, n_model = 4, 2
    mesh = make_mesh(data=n_data, model=n_model)

    def globalize(host, spec):
        host = np.asarray(host)
        s = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(host.shape, s,
                                            lambda idx: host[idx])

    # identical on every process (same seeds) — as a real deployment would
    # broadcast or re-derive the model
    tree_tile = 8
    forest = synthetic.generate_forest(tree_tile * 2 * n_model, 4, 12,
                                       leaf_prob=0.1, seed=7)
    rows = n_data * 16
    data = synthetic.generate_data(rows, 12, missing_prob=0.1, seed=8)
    want = oracle.predict(forest, data)
    lev = compiler.levelize(forest)

    # rows enter process-locally: this process contributes only the rows its
    # devices own (data axis is contiguous over processes for the (4, 2)
    # device grid: process 0 = shards 0-1, process 1 = shards 2-3)
    data_sharding = NamedSharding(mesh, P("data", None))
    local_rows = data[pid * (rows // nprocs):(pid + 1) * (rows // nprocs)]
    data_g = jax.make_array_from_process_local_data(
        data_sharding, np.asarray(local_rows, np.float32), (rows, 12)
    )

    report = {"processes": nprocs, "local_devices": n_local,
              "global_devices": n_global, "mesh": [n_data, n_model],
              "trees": forest.num_trees, "rows": rows, "engines": {}}

    def check(name, eng, *extra_tables):
        preds = eng._predict(eng_tables, *extra_tables, data_g)
        local_err = 0.0
        for sh in preds.addressable_shards:
            got = np.asarray(sh.data)
            local_err = max(local_err,
                            float(np.abs(got - want[sh.index]).max()))
        errs = multihost_utils.process_allgather(jnp.float32(local_err))
        err = float(np.asarray(errs).max())
        report["engines"][name] = {"max_err": err, "correct": err <= 1e-3}
        return err <= 1e-3

    fold = ShardedForestEngine(lev, mesh, row_tile=8, tree_tile=tree_tile)
    eng_tables = jax.tree.map(
        lambda t: globalize(t, P("model", *[None] * (np.ndim(t) - 1))),
        fold.tables,
    )
    ok = check("fold_f32", fold)

    rank = ShardedRankEngine(forest, mesh, row_tile=8, tree_tile=tree_tile)
    eng_tables = jax.tree.map(
        lambda t: globalize(t, P("model", *[None] * (np.ndim(t) - 1))),
        rank.tables,
    )
    rank_tables_g = jax.tree.map(
        lambda t: globalize(t, P(*[None] * np.ndim(t))), rank.rank_tables
    )
    ok &= check("rank_int8", rank, rank_tables_g)

    report["ok"] = bool(ok)
    if pid == 0:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MULTIPROC_r02.json")
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps(report), flush=True)
    return 0 if ok else 1


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, default=None)
    p.add_argument("--nprocs", type=int, default=2)
    args = p.parse_args()

    if args.pid is not None:
        return worker(args.pid, args.nprocs)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--pid", str(i),
             "--nprocs", str(args.nprocs)],
            env=env,
        )
        for i in range(args.nprocs)
    ]
    codes = [pr.wait() for pr in procs]
    print(f"worker exit codes: {codes}", flush=True)
    return 0 if all(c == 0 for c in codes) else 1


if __name__ == "__main__":
    sys.exit(main())
