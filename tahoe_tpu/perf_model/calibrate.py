"""Hardware calibration microbenchmarks.

The analog of the reference's adapted NVIDIA ``bandwidthTest`` probe
(bandwidthTest.h:110-381): measure the machine once, feed the analytical model
(main.cu:29-32 uses one bandwidth number plus fixed ratios). On TPU the
honest approach is *strategy-family microbenchmarks* (SURVEY.md §7 "fall back
on calibrated microbenchmarks per strategy family"): tiny forests run through
each engine family with slope timing, yielding per-(row·node) latencies that
the cost model scales to full forest shapes — XLA-compiled kernels are not
predictable from first-principles byte counts the way hand-counted CUDA
kernels were.

Nominal defaults (measured on TPU v5e, 2026-08) let the model run without
touching the device; ``measure()`` refines them live.

NOTE: every call here fences through a host read — the remote runtime acks
dispatches before execution, so ``block_until_ready`` alone measures nothing
(see .claude/skills/verify/SKILL.md).
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Optional


@dataclasses.dataclass(frozen=True)
class Calibration:
    """Per-element latencies in nanoseconds + machine constants."""

    # fused Pallas select-fold: ns per (row, node) visited
    fold_node_ns: float
    # jnp level-synchronous gather descent: ns per (row, tree, level)
    gather_step_ns: float
    # XLA (non-Pallas) select-fold with HBM intermediates: ns per (row, node)
    xla_node_ns: float
    hbm_gbps: float
    dispatch_us: float

    @staticmethod
    def default() -> "Calibration":
        # measured on TPU v5e (axon), SUSY-class shapes, 2026-08-17
        return Calibration(
            fold_node_ns=0.0024,     # 0.30 us/sample @ 127.5k nodes/row
            gather_step_ns=41.0,     # 186 us/sample @ 500 trees * 9 levels
            xla_node_ns=0.050,       # 6.4 us/sample @ 127.5k nodes/row
            hbm_gbps=800.0,
            dispatch_us=80.0,
        )


_cached: Optional[Calibration] = None


def _slope_time(run_k, k1=2, k2=10, n=3) -> float:
    """Median wall time per iteration via the chained-iteration slope."""
    import numpy as np

    def timed(k):
        _ = float(np.asarray(run_k(k)).ravel()[0])  # compile + warm + fence
        ts = []
        for _i in range(n):
            t0 = time.perf_counter()
            _ = float(np.asarray(run_k(k)).ravel()[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, t2 = timed(k1), timed(k2)
    # noise guard: the fence RTT is ~25 ms — a slope from a delta below
    # ~20 ms is jitter, not signal (it silently produced near-zero
    # xla_node_ns and flipped the model's argmin). Stretch the chain.
    tries = 0
    while (t2 - t1) < 0.02 and tries < 5:
        k2 = k1 + (k2 - k1) * max(2, int(0.04 / max(t2 - t1, 1e-3)))
        t2 = timed(k2)
        tries += 1
    return max((t2 - t1) / (k2 - k1), 1e-9)


def measure(force: bool = False) -> Calibration:
    """Micro-run each engine family on a tiny forest (tens of seconds)."""
    global _cached
    if _cached is not None and not force:
        return _cached

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tahoe_tpu.forest import compiler, synthetic

    trees, depth, cols, rows = 128, 7, 18, 1024
    forest = synthetic.generate_forest(trees, depth, cols, seed=5)
    data = synthetic.generate_data(rows, cols, seed=6)
    lev = compiler.levelize(forest)
    data_d = jax.device_put(jnp.asarray(data))
    nodes_per_row = trees * (1 << depth)

    # --- dispatch + HBM first: small executables, before any engine claims
    # the device program cache ---------------------------------------------
    z = jnp.ones((8, 128), jnp.float32)
    null = jax.jit(lambda v: v + 1.0)
    null(z).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        null(z).block_until_ready()
    dispatch_us = (time.perf_counter() - t0) / 20 * 1e6

    big = jnp.ones((32 * 1024 * 1024,), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def hbm_k(b, k):
        def body(i, a):
            # scale by a carry-dependent value so nothing hoists out
            return (b * (jnp.float32(1.0) + a * jnp.float32(1e-30))).sum()

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    t = _slope_time(lambda k: hbm_k(big, k=k), k1=4, k2=16)
    # per iteration: read b, write the scaled copy, read it back for the sum
    # (XLA does not fuse the multiply into the reduce here — measured ~3
    # passes on v5e)
    hbm_gbps = min(3 * big.nbytes / t / 1e9, 1200.0)

    # --- fused fold kernel ---------------------------------------------------
    from tahoe_tpu.ops.fold_kernel import FoldKernelEngine

    fold = FoldKernelEngine(lev, row_tile=256, tree_tile=64,
                            interpret=jax.default_backend() == "cpu")
    t = _slope_time(lambda k: fold.predict_k(data_d, k))
    fold_node_ns = t / rows / nodes_per_row * 1e9

    # --- gather descent ------------------------------------------------------
    from tahoe_tpu.ops.gather_engine import GatherEngine

    gat = GatherEngine(forest)
    t = _slope_time(lambda k: gat.predict_k(data_d, k), k1=1, k2=4)
    gather_step_ns = t / rows / (trees * (depth + 1)) * 1e9

    # --- XLA fold (take mode) ------------------------------------------------
    from tahoe_tpu.ops.tensor_engine import TensorEngine

    # row_tile = rows → one lax.map chunk → much cheaper remote compile
    xla = TensorEngine(lev, select_mode="take", row_tile=rows)
    t = _slope_time(lambda k: xla.predict_k(data_d, k), k1=1, k2=5)
    xla_node_ns = t / rows / nodes_per_row * 1e9

    _cached = _sanity_clamp(Calibration(
        fold_node_ns=fold_node_ns,
        gather_step_ns=gather_step_ns,
        xla_node_ns=xla_node_ns,
        hbm_gbps=hbm_gbps,
        dispatch_us=dispatch_us,
    ))
    return _cached


def _sanity_clamp(c: Calibration) -> Calibration:
    """Clamp each probe to [x/3, 3x] of its long-run default.

    The shared single-chip runtime occasionally returns garbage micro-runs
    (observed: fold_node_ns measured 19 ps — 8x reality — which flipped
    every model prediction that sweep). Chip drift is ~±30%, so a 3x band
    passes every honest reading while discarding the pathological ones."""
    d = Calibration.default()
    def cl(v, ref):
        return float(min(max(v, ref / 3.0), ref * 3.0))

    return Calibration(
        fold_node_ns=cl(c.fold_node_ns, d.fold_node_ns),
        gather_step_ns=cl(c.gather_step_ns, d.gather_step_ns),
        xla_node_ns=cl(c.xla_node_ns, d.xla_node_ns),
        hbm_gbps=cl(c.hbm_gbps, d.hbm_gbps),
        dispatch_us=cl(c.dispatch_us, d.dispatch_us),
    )


CACHE_PATH = os.path.join(
    os.path.expanduser("~"), ".cache", "tahoe_tpu", "calibration.json"
)
# single-chip throughput drifts up to ~30% between sessions; a few-hour-old
# calibration still ranks strategies correctly (the model compares ratios),
# but don't trust one from yesterday
CACHE_MAX_AGE_S = 6 * 3600.0


def measure_subprocess(cache: bool = True) -> Calibration:
    """Run the probes in a child process and parse its JSON line; results are
    cached on disk for CACHE_MAX_AGE_S (the probes take minutes on a remote
    runtime — the reference's bandwidthTest analog runs in seconds, so repeat
    CLI invocations shouldn't re-pay them).

    A child process is needed when the caller must NOT initialize a JAX
    backend itself — e.g. the CLI, whose strategy enumeration spawns
    per-strategy workers: the TPU tunnel here is exclusive, so a parent
    holding a backend would deadlock every child
    (see .claude/skills/verify/SKILL.md).
    """
    import json
    import subprocess
    import sys

    if cache:
        try:
            if time.time() - os.path.getmtime(CACHE_PATH) < CACHE_MAX_AGE_S:
                with open(CACHE_PATH) as f:
                    d = json.load(f)
                return _sanity_clamp(Calibration(**{
                    k.name: d[k.name]
                    for k in dataclasses.fields(Calibration)
                }))
        except (OSError, KeyError, ValueError):
            pass  # stale/missing/corrupt cache → measure fresh

    env = dict(os.environ)
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-m", "tahoe_tpu.perf_model.calibrate"],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines() or [""]):
        if line.strip().startswith("{"):
            d = json.loads(line)
            if cache:
                try:
                    os.makedirs(os.path.dirname(CACHE_PATH), exist_ok=True)
                    with open(CACHE_PATH, "w") as f:
                        json.dump(d, f)
                except OSError:
                    pass
            return _sanity_clamp(Calibration(**d))
    raise RuntimeError(
        f"calibration subprocess failed: {out.stderr.strip()[-300:]}"
    )


if __name__ == "__main__":
    import json

    c = measure()
    print(json.dumps(dataclasses.asdict(c)), flush=True)
