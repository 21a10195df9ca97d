"""Subprocess benchmark worker: time ONE strategy in a fresh process.

Why a subprocess: the axon remote backend device-caches only the first large
executable per process; a second Pallas engine in the same process gets
re-shipped through the tunnel on every call, which would make an in-process
strategy enumeration (the reference's selected_algorithm loop,
BaseTahoeTest.h:652-706) time everything after the first strategy as tunnel
bandwidth instead of kernel speed. One strategy per process keeps every
measurement honest. On a local TPU runtime this isolation is unnecessary but
harmless.

Protocol: argv = forest.npz data.npy strategy_name warmup epochs
[row_tile tree_tile] ("-" = strategy default);
stdout = one JSON line {us_per_sample, correct, max_err, rows}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def run(spec_path: str, data_path: str, strategy_name: str,
        warmup: int, epochs: int, row_tile=None, tree_tile=None) -> dict:
    import jax
    import jax.numpy as jnp

    from tahoe_tpu.config import ORACLE_ATOL, Strategy
    from tahoe_tpu.engine.forest import Forest
    from tahoe_tpu.forest import io

    spec = io.load_forest_npz(spec_path)
    data = np.load(data_path)
    strategy = Strategy[strategy_name]

    forest = Forest(spec)
    reason = forest.feasible(strategy)
    if reason is not None:
        return {"skipped": reason}

    eng = forest.engine(strategy, row_tile=row_tile, tree_tile=tree_tile)
    data_d = jax.device_put(jnp.asarray(data, jnp.float32))

    # Median of 3 independent slope measurements per strategy (VERDICT r4
    # weak #1 / next #2): chip throughput drifts a few percent between
    # chains, and near-tie strategy siblings (mnist's VMEM-vs-SPLIT pair,
    # ~2.5% apart) flip winner on single-slope records. The reference takes
    # 50 timed epochs per strategy for exactly this reason
    # (BaseTahoeTest.h:684-698). Compiled predict_k executables are reused
    # across repeats (same k values), so repeats cost timed chains only.
    slopes = [timed_epoch_seconds(eng, data_d, warmup=warmup, epochs=epochs)
              for _ in range(3)]
    dt = float(np.median(slopes))
    us = [s * 1e6 / data.shape[0] for s in slopes]

    preds = eng.predict(data_d)
    want = forest.predict_oracle(data)
    err = float(np.abs(np.asarray(preds) - want).max())
    return {
        "us_per_sample": dt * 1e6 / data.shape[0],
        "us_band": [min(us), max(us)],
        "us_slopes": us,
        "seconds_per_epoch": dt,
        "max_err": err,
        "correct": bool(err <= ORACLE_ATOL),
        "rows": int(data.shape[0]),
    }


def timed_epoch_seconds(eng, data_d, *, warmup: int, epochs: int,
                        budget_s: float = 90.0) -> float:
    """Per-predict seconds via the chained-iteration slope.

    The remote TPU runtime acks dispatches before execution finishes and only
    a host read of the result is a true fence (~25 ms round trip), so naive
    per-call timing measures the enqueue rate. Instead: run k dependent
    predicts inside one jit (engine.predict_k), fence once, and fit
      t(k2) - t(k1) = (k2 - k1) * t_predict
    which cancels both the dispatch and the fence. ``epochs`` plays the same
    role as the reference's timed-epoch count (BaseTahoeTest.h:43).
    """
    import numpy as np

    def fence(r):
        return float(np.asarray(r).ravel()[0])

    def timed(k, n=3):
        fence(eng.predict_k(data_d, k))  # compile + warm
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fence(eng.predict_k(data_d, k))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    k1 = max(1, warmup)
    t1 = timed(k1)
    per_call_est = t1 / k1
    k2 = k1 + max(4, min(epochs, int(budget_s / max(per_call_est, 1e-4))))
    t2 = timed(k2)
    # Noise guard: the fence RTT is ~25 ms, so a slope measured from a delta
    # below ~20 ms is dominated by jitter (fast engines / small batches).
    # Stretch the chain until the delta is comfortably above the noise floor.
    tries = 0
    while (t2 - t1) < 0.02 and tries < 4:
        grow = max(2, int(0.04 / max(t2 - t1, 1e-3)))
        k2 = k1 + (k2 - k1) * grow
        if per_call_est * k2 > budget_s * 4:
            break
        t2 = timed(k2)
        tries += 1
    return max((t2 - t1) / (k2 - k1), 1e-9)


def main(argv):
    spec_path, data_path, strategy_name, warmup, epochs = argv[:5]
    tiles = argv[5:7]
    rt = int(tiles[0]) if len(tiles) > 0 and tiles[0] != "-" else None
    tt = int(tiles[1]) if len(tiles) > 1 and tiles[1] != "-" else None
    try:
        result = run(spec_path, data_path, strategy_name, int(warmup),
                     int(epochs), rt, tt)
    except Exception as e:  # report failures as data, not tracebacks
        result = {"error": f"{type(e).__name__}: {e}"}
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
