"""Chip smoke + A/B for the int8 v2 rank transform (r4).

Proves, on the real v5e, for all three v2 kernel branches (paired,
unpaired, group-streamed):
  1. int8 digit planes produce BIT-IDENTICAL int8 plane vectors to the
     proven bf16 path, and
  2. the int8 path's speed vs bf16 same-session (digit matmuls at the int8
     MXU rate should roughly halve the transform's MXU time).
Then times the headline config's FULL predict with the int8 transform.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=... \
      timeout 3600 python scripts/int8_transform_smoke.py > /tmp/i8t.out 2>&1
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tahoe_tpu.forest import synthetic
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.ops.rank_transform import (
        RankTransformer,
        build_bucket_tables,
        rank_planes_kernel_v2,
    )

    interpret = jax.default_backend() == "cpu"
    rows = 65536 if not interpret else 1024
    results = {}

    def out(tag, v):
        results[tag] = v
        print(json.dumps({tag: v}), flush=True)

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

    import functools

    def transform_chain(tr, tables, data_d, rt):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(tabs, data, k):
            def body(_, acc):
                pls = tr.transform(tabs, data + acc[0] * 0.0, row_tile=rt,
                                   interpret=interpret)
                return (jnp.zeros(data.shape[0], jnp.float32)
                        + pls[: data.shape[0], 0].astype(jnp.float32))

            return jax.lax.fori_loop(0, k, body,
                                     jnp.zeros(data.shape[0], jnp.float32))

        return lambda k: run(tables, data_d, k)

    # branch cases: (tag, trees, depth, cols) — paired needs S<=64,
    # unpaired S>64 (dense threshold tables), group mode needs >30 features
    CASES = [
        ("paired_susy", 500, 8, 18),
        ("unpaired_dense", 1500, 8, 10),
        ("group_100col", 250, 8, 100),
    ]
    for tag, T, D, C in CASES:
        forest = synthetic.generate_forest(T, D, C, seed=3)
        data = synthetic.generate_data(min(rows, 16384), C,
                                       missing_prob=0.02, seed=4)
        data_d = jax.device_put(jnp.asarray(data, jnp.float32))
        from tahoe_tpu.forest.quantize import band_split, quantize

        q, vf_base = band_split(quantize(forest))
        if not (max(len(t) for t in q.tables) > 256):
            out(tag, "SKIP: v1 table size")
            continue
        tr = RankTransformer(q, vf_base, forest.missing)
        if not tr.v2:
            out(tag, "SKIP: not v2")
            continue
        # bf16 reference tables for the SAME quantization
        cmax_b, digs_b, S_b, paired_b = build_bucket_tables(
            q.tables, tr.num_cols, digit_dtype=jnp.bfloat16)
        x = tr.canonicalize(data_d, 256)
        p8 = np.asarray(rank_planes_kernel_v2(
            x, *tr.rank_tables, tr.bucket_s, tr.bucket_paired,
            row_tile=256, interpret=interpret))
        pb = np.asarray(rank_planes_kernel_v2(
            x, cmax_b, digs_b, S_b, paired_b,
            row_tile=256, interpret=interpret))
        same = bool(np.array_equal(p8, pb))
        info = {"paired": tr.bucket_paired, "S": tr.bucket_s,
                "bit_identical": same}
        if not interpret:
            t8 = slope(transform_chain(tr, tr.rank_tables, data_d, 2048))
            tb = slope(transform_chain(
                tr, (cmax_b, digs_b), data_d, 2048))
            info["int8_us"] = round(t8 * 1e6 / data.shape[0], 6)
            info["bf16_us"] = round(tb * 1e6 / data.shape[0], 6)
        out(tag, info)

    # headline full predict with the int8 transform (shipping config)
    if not interpret:
        from tahoe_tpu.config import TpuLimits
        from tahoe_tpu.ops.rank_kernel import RankFoldEngine

        forest = synthetic.susy_class_forest(seed=0)
        data = synthetic.generate_data(rows, 18, missing_prob=0.02, seed=1)
        data_d = jax.device_put(jnp.asarray(data, jnp.float32))
        want = oracle.predict(forest, data)
        eng = RankFoldEngine(forest, row_tile=2048, tree_tile=128,
                             split_level=4, col_chunk=2048,
                             transform_row_tile=2048, interpret=interpret,
                             limits=TpuLimits())
        err = float(np.abs(np.asarray(eng.predict(data_d)) - want).max())
        ts = sorted(slope(lambda k: eng.predict_k(data_d, k))
                    for _ in range(3))
        out("headline_full_int8", {
            "parity_err": err,
            "full_us": round(ts[1] * 1e6 / rows, 6),
            "band": [round(t * 1e6 / rows, 6) for t in (ts[0], ts[2])]})

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
