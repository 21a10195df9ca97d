"""Structural validation of the scaling model's psum term (VERDICT r2 #7).

perf_model.scaling prices tree-sharded inference with a ring all-reduce
term  T_psum = 2*(n-1)/n * B/bw + (n-1)*lat.  Absolute bw/lat cannot be
measured without multi-host TPU hardware, but the term's STRUCTURE can: on
the 2-process x 4-virtual-device gloo mesh (the same jax.distributed code
path as real multi-host), time a bare cross-process psum over the "model"
axis for n_model in {2, 4} and payloads B x {1, 2, 4}, then least-squares
fit  t = a * (2*(n-1)/n * B) + b * (n-1) + c  and report the fit quality.
A good fit (R^2, positive a/b) means the 90.8% config-5 efficiency claim
rests on a structurally-checked formula with only the constants taken from
spec sheets.

Usage (single command — self-launches the 2 workers):
  python scripts/psum_shape.py            -> writes PSUM_SHAPE_r03.json
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

PORT = 12741
BASE_ROWS = 262144  # 1 MiB f32 payload per data shard at n_data=1


def worker(pid: int, nprocs: int) -> int:
    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=nprocs,
        process_id=pid,
    )
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tahoe_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8

    def time_psum(n_model: int, rows: int, epochs: int = 40) -> float:
        n_data = 8 // n_model
        mesh = make_mesh(data=n_data, model=n_model)
        sh = NamedSharding(mesh, P("data", "model"))
        x = jax.device_put(
            np.ones((rows, n_model), np.float32), sh)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(x, k):
            def inner(xb):
                # the carry must have a stable replication type under
                # shard_map: start replicated (one psum), then each
                # iteration re-varies it over "model" (axis_index term)
                # before the next psum so every iteration runs a REAL
                # collective with an unbroken dependence chain
                idx = jax.lax.axis_index("model").astype(jnp.float32)

                def body_fn(_, v):
                    w = v * jnp.float32(0.5) + idx * jnp.float32(1e-6)
                    return jax.lax.psum(w, "model")

                v0 = jax.lax.psum(xb, "model")
                return jax.lax.fori_loop(0, k, body_fn, v0)

            f = shard_map(
                inner,
                mesh=mesh, in_specs=P("data", "model"),
                out_specs=P("data", None),
            )
            return f(x)

        def run(k):
            r = chain(x, k)
            r.block_until_ready()

        run(3)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(3 + epochs)
            t1 = time.perf_counter()
            run(3)
            t2 = time.perf_counter()
            ts.append(((t1 - t0) - (t2 - t1)) / epochs)
        return float(np.median(ts))

    points = []
    for n_model in (2, 4):
        for mult in (1, 2, 4):
            rows = BASE_ROWS * mult
            t = time_psum(n_model, rows)
            # per-device payload: its [rows/n_data, 1] f32 block
            b_bytes = rows // (8 // n_model) * 4
            points.append({"n_model": n_model, "payload_bytes": b_bytes,
                           "t_s": t})
            if pid == 0:
                print(json.dumps(points[-1]), flush=True)

    if pid == 0:
        # fit t = a * (2*(n-1)/n * B) + b * (n-1) + c
        X = np.array([
            [2.0 * (p["n_model"] - 1) / p["n_model"] * p["payload_bytes"],
             p["n_model"] - 1.0, 1.0]
            for p in points
        ])
        y = np.array([p["t_s"] for p in points])
        coef, *_ = np.linalg.lstsq(X, y, rcond=None)
        pred = X @ coef
        ss_res = float(((y - pred) ** 2).sum())
        ss_tot = float(((y - y.mean()) ** 2).sum())
        r2 = 1.0 - ss_res / max(ss_tot, 1e-30)
        report = {
            "points": points,
            "fit": {"ring_byte_s": float(coef[0]),
                    "hop_latency_s": float(coef[1]),
                    "fixed_s": float(coef[2]),
                    "r2": r2,
                    "effective_gbps": (1e-9 / coef[0]) if coef[0] > 0 else None},
            "structure_ok": bool(r2 > 0.9 and coef[0] > 0),
            "note": ("gloo-over-localhost constants are NOT ICI/DCN "
                     "constants; this validates the term's functional "
                     "form (linear in payload, (n-1)/n ring growth), "
                     "per VERDICT r2 next-round #7"),
        }
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PSUM_SHAPE_r03.json")
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps(report), flush=True)
    return 0


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
