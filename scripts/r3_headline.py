"""Round-3 headline sweep: close the 0.127 -> 0.120 us/sample gap (VERDICT r2
next-round #1) with same-session comparative measurements at the bench batch
size (65536 rows).

Axes (all on the SUSY-class forest, the reference's headline family,
README.md:66-67):
  A. bench config (ls4/rt1024/tt128/trt2048) full + planes, 5 slopes -> band
  B. col_chunk {512, 1024, 2048} x {ls0/rt256, ls4/rt1024}
  C. chunk_lead on/off at both configs
  D. transform_row_tile {2048, 4096} at 64k (dispatch amortization)

Chip throughput drifts +-15..30% between sessions — only within-run
comparisons are meaningful; the run records every slope raw.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=... \
      timeout 3000 python scripts/r3_headline.py > /tmp/r3_headline.out
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
    forest = synthetic.susy_class_forest(seed=0)
    rows = 65536
    data = synthetic.generate_data(rows, 18, missing_prob=0.02, seed=1)
    data_d = jax.device_put(jnp.asarray(data, jnp.float32))

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
        return max((t2 - t1) / (k2 - k1), 1e-9)

    results = {}

    def out(tag, v):
        results[tag] = v
        print(json.dumps({tag: v}), flush=True)

    def planes_chain(eng, planes):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(tables, pl_, k):
            def body(_, acc):
                pp = pl_ + (acc[:1, None] * 0).astype(jnp.int8)
                return eng._margins_planes(tables, pp)

            return jax.lax.fori_loop(
                0, k, body, jnp.zeros(pl_.shape[0], jnp.float32))

        return lambda k: run(eng.tables, planes, k)

    # ---- A. the bench config: 5 independent slopes (full), 3 (planes) ----
    bench = RankFoldEngine(forest, row_tile=1024, tree_tile=128,
                           split_level=4, transform_row_tile=2048,
                           interpret=interpret, limits=TpuLimits())
    want = oracle.predict(forest, data)
    err = float(np.abs(np.asarray(bench.predict(data_d)) - want).max())
    out("bench_cfg_err", err)
    out("bench_full_slopes_us", [
        round(slope(lambda k: bench.predict_k(data_d, k)) * 1e6 / rows, 6)
        for _ in range(5)
    ])
    planes = jax.device_put(jnp.asarray(quantize.encode_rank_planes_np(
        quantize.transform_rows_np(bench.q, data))))
    ch = planes_chain(bench, planes)
    out("bench_planes_slopes_us", [
        round(slope(ch) * 1e6 / rows, 6) for _ in range(3)
    ])
    del bench

    # ---- B/C. col_chunk x config x chunk_lead (planes path; the full path
    # adds the same transform constant to all of them) ----
    for tag, kw in [
        ("ls0_rt256_cc512", dict(row_tile=256, tree_tile=128, split_level=0,
                                 col_chunk=512)),
        ("ls0_rt256_cc1024", dict(row_tile=256, tree_tile=128, split_level=0,
                                  col_chunk=1024)),
        ("ls0_rt256_cc2048", dict(row_tile=256, tree_tile=128, split_level=0,
                                  col_chunk=2048)),
        ("ls0_rt256_cc1024_chlead", dict(row_tile=256, tree_tile=128,
                                         split_level=0, col_chunk=1024,
                                         chunk_lead=True)),
        ("ls4_rt1024_cc512", dict(row_tile=1024, tree_tile=128,
                                  split_level=4, col_chunk=512)),
        ("ls4_rt1024_cc1024", dict(row_tile=1024, tree_tile=128,
                                   split_level=4, col_chunk=1024)),
        ("ls4_rt1024_cc2048", dict(row_tile=1024, tree_tile=128,
                                   split_level=4, col_chunk=2048)),
        ("ls4_rt1024_cc1024_chlead", dict(row_tile=1024, tree_tile=128,
                                          split_level=4, col_chunk=1024,
                                          chunk_lead=True)),
        ("ls5_rt1024_cc1024", dict(row_tile=1024, tree_tile=128,
                                   split_level=5, col_chunk=1024)),
        ("ls3_rt512_cc1024", dict(row_tile=512, tree_tile=128,
                                  split_level=3, col_chunk=1024)),
    ]:
        try:
            eng = RankFoldEngine(forest, interpret=interpret,
                                 limits=TpuLimits(), **kw)
            t = slope(planes_chain(eng, planes))
            out("p64k_" + tag, round(t * 1e6 / rows, 6))
            del eng
        except Exception as e:
            out("p64k_" + tag, f"{type(e).__name__}: {e}")

    # ---- D. transform amortization at 64k on the best-known config ----
    for trt in (2048, 4096):
        try:
            eng = RankFoldEngine(forest, row_tile=1024, tree_tile=128,
                                 split_level=4, transform_row_tile=trt,
                                 interpret=interpret, limits=TpuLimits())
            t = slope(lambda k: eng.predict_k(data_d, k))
            out(f"full64k_trt{trt}", round(t * 1e6 / rows, 6))
            del eng
        except Exception as e:
            out(f"full64k_trt{trt}", f"{type(e).__name__}: {e}")

    print(json.dumps({"ALL": results}), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
