"""Round-2 session-2 deep-forest rank retune (VERDICT r1 item 9).

deep14 (60 trees, D=14, C=20) measured 4.28 us r4 and deep15 (30, D=15, 16)
4.53 us — both well off the MXU bound (~1.8 / ~1.2 us at G=3 / G=2). The
split-mode slabs re-stream per row tile unless the stream-once chunk covers
the batch; small (TR << Ls) = 128 configs make the roots scratch tiny so one
chunk spans every row. This sweep measures those configs same-session.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
      python scripts/deep_sweep.py > /tmp/deep_sweep.out 2>&1
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
        return max((t2 - t1) / (k2 - k1), 1e-9), k2

    results = {}

    def out(tag, v):
        results[tag] = v
        print(json.dumps({tag: v}), flush=True)

    CASES = {
        "deep14": (60, 14, 20, 2000),
        "deep15": (30, 15, 16, 1000),
    }
    CONFIGS = {
        "deep14": [
            ("auto", dict()),
            # Db <= 6 configs: below the measured compile wall (Db>=7 at
            # G=3 hung >13 min, r2 — rank_kernel.compile_wall) AND small
            # enough for stream-once to cover the whole batch (round 3)
            ("tr1_ls8", dict(tree_tile=1, split_level=8)),
            ("tr1_ls9", dict(tree_tile=1, split_level=9)),
            ("tr2_ls8", dict(tree_tile=2, split_level=8)),
            ("tr1_ls8_rt256", dict(tree_tile=1, split_level=8, row_tile=256)),
            ("tr1_ls7", dict(tree_tile=1, split_level=7)),  # walled: records reason
            ("tr8_ls4", dict(tree_tile=8, split_level=4)),
        ],
        "deep15": [
            ("auto", dict()),
            ("tr1_ls9", dict(tree_tile=1, split_level=9)),
            ("tr1_ls10", dict(tree_tile=1, split_level=10)),
            ("tr2_ls9", dict(tree_tile=2, split_level=9)),
            ("tr1_ls8", dict(tree_tile=1, split_level=8)),
            ("tr1_ls9_rt256", dict(tree_tile=1, split_level=9, row_tile=256)),
        ],
    }

    for name, (T, D, C, rows) in CASES.items():
        forest = synthetic.generate_forest(T, D, C, seed=1)
        data = synthetic.generate_data(rows, C, missing_prob=0.0, seed=2)
        want = oracle.predict(forest, data)
        data_d = jax.device_put(jnp.asarray(data, jnp.float32))
        checked = False
        for tag, kw in CONFIGS[name]:
            kw = dict(kw)
            kw.setdefault("row_tile", 128)
            try:
                eng = RankFoldEngine(forest, interpret=interpret,
                                     limits=TpuLimits(), **kw)
                info = dict(ls=eng.split_level, tt=eng.tree_tile,
                            rt=eng.row_tile, g=eng.groups,
                            chunk=eng.stream_chunk_rows)
                t, _ = slope(lambda k: eng.predict_k(data_d, k))
                us = t * 1e6 / rows
                if not checked:
                    err = float(np.abs(
                        np.asarray(eng.predict(data_d)) - want).max())
                    out(f"{name}_parity_err", err)
                    checked = True
                out(f"{name}_{tag}", [round(us, 4), info])
            except Exception as e:
                out(f"{name}_{tag}", f"{type(e).__name__}: {str(e)[:200]}")

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
