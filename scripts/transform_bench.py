"""Rank-transform schedule bench: chain vs phase issue order (one process).

unit_bench r2 showed the v2 transform running latency-bound on ~18 serialized
small matmuls per row tile. This measures the reordered "phase" schedule
against the original "chain", then the best full-predict combination with the
ls4/rt1024 engine config (winner of ls_sweep3).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 \
      python scripts/transform_bench.py
"""
from __future__ import annotations

import functools
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
    forest = synthetic.susy_class_forest(seed=0)
    rows = 16384
    data = synthetic.generate_data(rows, 18, missing_prob=0.02, seed=1)
    data_d = jax.device_put(jnp.asarray(data, jnp.float32))
    rows_big = 65536
    data_big = synthetic.generate_data(rows_big, 18, missing_prob=0.02, seed=2)
    data_big_d = jax.device_put(jnp.asarray(data_big, jnp.float32))
    want = oracle.predict(forest, data)

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
        return max((t2 - t1) / (k2 - k1), 1e-9), k2

    results = {}

    def transform_chain(eng, dd):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(rank_tables, d, k):
            def body(_, acc):
                pls = eng._transform(rank_tables, d + acc[0] * 0.0)
                return jnp.zeros(d.shape[0], jnp.float32) + pls[
                    : d.shape[0], 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, k, body,
                                     jnp.zeros(d.shape[0], jnp.float32))

        return lambda k: run(eng.rank_tables, dd, k)

    # engine config fixed to the ls_sweep3 winner; vary transform schedule/rt
    for sched in ("chain", "phase"):
        for rt in (256, 512, 1024):
            eng = RankFoldEngine(
                forest, row_tile=rt, tree_tile=128, split_level=4,
                interpret=interpret, transform_schedule=sched,
                limits=TpuLimits(),
            )
            t, _ = slope(transform_chain(eng, data_d))
            results[f"tf_{sched}_rt{rt}"] = round(t * 1e6 / rows, 6)
            print(json.dumps({f"tf_{sched}_rt{rt}":
                              results[f"tf_{sched}_rt{rt}"]}), flush=True)

    # full predict, best engine config x schedule, 16k and 64k
    for sched in ("chain", "phase"):
        eng = RankFoldEngine(
            forest, row_tile=1024, tree_tile=128, split_level=4,
            interpret=interpret, transform_schedule=sched,
            limits=TpuLimits(),
        )
        t, _ = slope(lambda k: eng.predict_k(data_d, k))
        results[f"full16k_{sched}"] = round(t * 1e6 / rows, 6)
        t, _ = slope(lambda k: eng.predict_k(data_big_d, k))
        results[f"full64k_{sched}"] = round(t * 1e6 / rows_big, 6)
        err = float(np.abs(np.asarray(eng.predict(data_d)) - want).max())
        results[f"err_{sched}"] = err
        print(json.dumps({k: v for k, v in results.items()
                          if k.endswith(sched)}), flush=True)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
