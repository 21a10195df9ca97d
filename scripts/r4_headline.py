"""Round-4 headline config sweep: SUSY-class full predict at 65536 rows.

Batch-1 same-session readings settled trt2048 as the transform tile
(0.1273 vs 0.1298 @ 1024 / 0.1314 @ 4096 — r3's trt4096=0.0986 was drift,
VERDICT r3 weak #1). The remaining lever the overhead audit points at is
MXU weight-load amortization: the per-chunk dots latch a 128x128 weight
tile per 128 output columns, so efficiency ~ Rt/(Rt+128) — rt2048 (94%)
vs the shipping rt1024 (89%). This sweep measures the rt/ls/cc
neighborhood of the shipping config in ONE session, full predict AND
plane-resident, 3-slope medians, bands reported.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=... \
      timeout 4800 python scripts/r4_headline.py > /tmp/r4_headline.out
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
    from tahoe_tpu.forest import quantize, synthetic
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    interpret = jax.default_backend() == "cpu"
    rows = 65536 if not interpret else 2048
    forest = synthetic.susy_class_forest(seed=0)
    data = synthetic.generate_data(rows, 18, missing_prob=0.02, seed=1)
    data_d = jax.device_put(jnp.asarray(data, jnp.float32))
    want = oracle.predict(forest, data)

    def fence(r):
        return float(np.asarray(r).ravel()[0])

    def slope(run_k, k1=3, k2=27, n=3):
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

    def med3(run_k):
        ts = sorted(slope(run_k) for _ in range(3))
        return ts[1], ts[0], ts[2]

    results = {}

    def out(tag, v):
        results[tag] = v
        print(json.dumps({tag: v}), flush=True)

    # round 2 (same file, second run): cc2048 won round 1 (0.1203 vs 0.1287
    # at cc1024 — one whole ls4 bottom slab per dot); probe the neighbors.
    # rt2048 needs the loosened budget: the x2 split derate is calibrated on
    # deep G=3 shapes and the estimate (34.8 MiB) is well under the 64 MiB
    # Mosaic cap — attempt the real compile and let Mosaic arbitrate.
    loose = TpuLimits(vmem_fraction=1.2)
    CONFIGS = [
        ("rt1024_ls4_cc2048", dict(row_tile=1024, split_level=4,
                                   col_chunk=2048)),
        ("rt1024_ls3_cc2048", dict(row_tile=1024, split_level=3,
                                   col_chunk=2048)),
        ("rt1024_ls3_cc4096", dict(row_tile=1024, split_level=3,
                                   col_chunk=4096)),
        ("rt2048_ls4_cc2048_loose", dict(row_tile=2048, split_level=4,
                                         col_chunk=2048, limits=loose)),
        ("rt1024_ls5_cc2048", dict(row_tile=1024, split_level=5,
                                   col_chunk=2048)),
    ]

    checked = False
    for tag, kw in CONFIGS:
        try:
            kw = dict(kw)
            limits = kw.pop("limits", TpuLimits())
            eng = RankFoldEngine(forest, tree_tile=128,
                                 transform_row_tile=2048,
                                 interpret=interpret, limits=limits,
                                 **kw)
        except Exception as e:  # noqa: BLE001
            out(tag, f"{type(e).__name__}: {str(e)[:160]}")
            continue
        try:
            if not checked:
                err = float(np.abs(
                    np.asarray(eng.predict(data_d)) - want).max())
                out("parity_err", err)
                checked = True
            m, lo, hi = med3(lambda k: eng.predict_k(data_d, k))
            full = [round(x * 1e6 / rows, 6) for x in (m, lo, hi)]

            planes = jax.device_put(jnp.asarray(
                quantize.encode_rank_planes_np(
                    quantize.transform_rows_np(eng.q, data))))

            @functools.partial(jax.jit, static_argnames=("k",))
            def planes_k(tables, pl_, k, _eng=eng):
                def body(_, acc):
                    pp = pl_ + (acc[:1, None] * 0).astype(jnp.int8)
                    return _eng._margins_planes(tables, pp)

                return jax.lax.fori_loop(
                    0, k, body, jnp.zeros(pl_.shape[0], jnp.float32))

            m, lo, hi = med3(lambda k: planes_k(eng.tables, planes, k))
            pl_us = [round(x * 1e6 / rows, 6) for x in (m, lo, hi)]
            out(tag, {"full_us": full[0], "full_band": full[1:],
                      "planes_us": pl_us[0], "planes_band": pl_us[1:],
                      "chunk": eng.stream_chunk_rows})
        except Exception as e:  # noqa: BLE001
            out(tag, f"{type(e).__name__}: {str(e)[:160]}")

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
