"""Hardware calibration microbenchmarks.

The analog of the reference's adapted NVIDIA ``bandwidthTest`` probe
(bandwidthTest.h:110-381: a device-to-device memcpy timed over 100 iterations
feeds the cost model as the one measured constant). Here three constants are
measured, each with a tiny XLA program on the live device:

- ``hbm_gbps``      — HBM streaming bandwidth (read+write of a large buffer)
- ``vpu_gops``      — vector-unit elementwise op rate (fused select chain)
- ``dispatch_us``   — per-call dispatch overhead (null op round trip)

Results are cached per process; ``Calibration.default()`` returns nominal
v5e numbers without touching the device (for tests / offline prediction).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional


@dataclasses.dataclass(frozen=True)
class Calibration:
    hbm_gbps: float
    vpu_gops: float
    dispatch_us: float

    @staticmethod
    def default() -> "Calibration":
        # nominal TPU v5e: ~819 GB/s HBM, O(1e12) vector ops/s
        return Calibration(hbm_gbps=800.0, vpu_gops=2000.0, dispatch_us=80.0)


_cached: Optional[Calibration] = None


def _median_time(fn, n=10) -> float:
    import jax

    jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def measure(force: bool = False) -> Calibration:
    """Run the probes on the default device (a few hundred ms total)."""
    global _cached
    if _cached is not None and not force:
        return _cached

    import jax
    import jax.numpy as jnp

    # --- HBM bandwidth: stream-copy a 128 MiB buffer (read + write) --------
    n = 32 * 1024 * 1024  # f32 elements
    x = jnp.arange(n, dtype=jnp.float32).reshape(-1, 1024)
    copy = jax.jit(lambda a: a * jnp.float32(1.0000001))
    t = _median_time(lambda: copy(x))
    hbm_gbps = (2 * 4 * n) / t / 1e9

    # --- VPU op rate: 64 fused selects per element on a VMEM-sized array ---
    y = jnp.ones((512, 1024), jnp.float32)

    def chain(a):
        b = a
        for _ in range(64):
            b = jnp.where(b > 0.5, b * 0.99, b * 1.01)
        return b

    chain_j = jax.jit(chain)
    t = _median_time(lambda: chain_j(y))
    # each where ≈ 2 vector ops (compare + select) on 512*1024 elements
    vpu_gops = (64 * 2 * y.size) / t / 1e9

    # --- dispatch overhead --------------------------------------------------
    z = jnp.ones((8, 128), jnp.float32)
    null = jax.jit(lambda a: a + 1.0)
    dispatch_us = _median_time(lambda: null(z)) * 1e6

    _cached = Calibration(hbm_gbps=hbm_gbps, vpu_gops=vpu_gops,
                          dispatch_us=dispatch_us)
    return _cached


def measure_subprocess() -> Calibration:
    """Run the probes in a child process and parse its JSON line.

    Needed when the caller must NOT initialize a JAX backend itself — e.g. the
    CLI, whose strategy enumeration spawns per-strategy workers: the TPU
    tunnel here is exclusive, so a parent holding a backend would deadlock
    every child (see .claude/skills/verify/SKILL.md).
    """
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-m", "tahoe_tpu.perf_model.calibrate"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    for line in reversed(out.stdout.strip().splitlines() or [""]):
        if line.strip().startswith("{"):
            d = json.loads(line)
            return Calibration(**d)
    raise RuntimeError(
        f"calibration subprocess failed: {out.stderr.strip()[-300:]}"
    )


if __name__ == "__main__":
    import json

    c = measure()
    print(json.dumps(dataclasses.asdict(c)), flush=True)
