"""Unit decomposition of the SUSY-class rank pipeline (one process).

Separates, in ONE session (chip drifts ~30% across sessions):
  - raw MXU rate: big int8 and bf16 dot_generals (are rank matmuls at int8 rate?)
  - matmul-only kernel: the real grid + level matmuls, selects removed
  - fold-only kernel: the real select/compare chain, matmuls (all but one) removed
  - transform-only chain: canonicalize + rank transform + int8 cast
  - plane-resident margins and full predict (controls)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 900 python scripts/unit_bench.py
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=16384)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tahoe_tpu.config import TpuLimits
    from tahoe_tpu.forest import quantize, synthetic
    from tahoe_tpu.ops.fold_kernel import LANE, _cdiv
    from tahoe_tpu.ops.mosaic import compile_kwargs
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    interpret = jax.default_backend() == "cpu"
    forest = synthetic.susy_class_forest(seed=0)
    eng = RankFoldEngine(forest, row_tile=256, tree_tile=128,
                         interpret=interpret, limits=TpuLimits())
    cfg = eng.cfg
    assert cfg.tree_outer and cfg.split_level == 0

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
    rows = args.rows
    data = synthetic.generate_data(rows, 18, missing_prob=0.02, seed=1)
    data_d = jax.device_put(jnp.asarray(data, jnp.float32))
    planes16 = jax.device_put(jnp.asarray(quantize.encode_rank_planes_np(
        quantize.transform_rows_np(eng.q, data))))

    D, TR, Rt, CH, G = cfg.depth, cfg.tree_tile, cfg.row_tile, cfg.col_chunk, cfg.groups
    n_tiles = cfg.padded_trees // cfg.tree_tile
    n_steps = n_tiles * (rows // Rt)
    results["grid_steps"] = n_steps

    # ---------------- raw MXU rate probes ----------------
    # big matmul, chained through the lhs to serialize. The r2 probe fed the
    # accumulator in as ``a + broadcast(scalar)`` — XLA's algebraic
    # simplifier distributes the dot over the add and hoists the
    # loop-invariant dot(a, b) OUT of the chain, so it measured the
    # scalar-residue loop (2850 "TMAC/s" vs the ~200 chip peak —
    # UNITBENCH_r02's INVALID note). A dynamic_update_slice dependency is
    # not separable, so every iteration really runs the full dot.
    rng = np.random.default_rng(0)

    def mm_chain(dtype, M=1024, K=128, N=32768):
        a = jnp.asarray(rng.integers(-3, 3, (M, K)).astype(np.float32)).astype(dtype)
        b = jnp.asarray(rng.integers(-3, 3, (K, N)).astype(np.float32)).astype(dtype)

        @functools.partial(jax.jit, static_argnames=("k",))
        def run(a, b, k):
            def body(_, acc):
                a2 = jax.lax.dynamic_update_slice(
                    a, acc[:1, :1].astype(dtype), (0, 0))
                d = jax.lax.dot_general(
                    a2, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=(
                        jnp.int32 if dtype == jnp.int8 else jnp.float32),
                )
                # consume EVERY output column: a [:, :1] slice let XLA
                # narrow the dot to one column (the second invalid-probe
                # failure mode, after r2's distribute-and-hoist)
                return acc + jnp.sum(d.astype(jnp.float32), axis=1,
                                     keepdims=True)

            return jax.lax.fori_loop(
                0, k, body, jnp.zeros((M, 1), jnp.float32))

        macs = M * K * N
        t, _ = slope(lambda k: run(a, b, k))
        return macs / t / 1e12  # TMAC/s

    # K=128 matches the rank kernel's per-dot contraction (G=1); K=2048
    # approaches the chip's peak systolic utilization for reference
    results["mxu_int8_tmacs_k128"] = mm_chain(jnp.int8)
    results["mxu_int8_tmacs_k2048"] = mm_chain(jnp.int8, K=2048, N=8192)
    results["mxu_bf16_tmacs_k128"] = mm_chain(jnp.bfloat16)

    # ---------------- kernel variants on the real grid ----------------
    def variant_margins(mode: str):
        """mode: 'matmul' = level matmuls only, cheap consume, no selects;
        'fold' = selects/compares with conds sliced from ONE matmul."""
        def kernel(p_ref, *refs):
            mat_refs = refs[0:D]
            leaf_ref = refs[D]
            out_ref = refs[D + 1]
            planes = p_ref[:]

            def cond_chunk(d, c0, width):
                rhs = mat_refs[d][:, c0 : c0 + width]
                return jax.lax.dot_general(
                    planes, rhs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )

            if mode == "matmul":
                # consume the FULL diff width: summing only [:, :LANE] let
                # the compiler narrow each dot to 128 columns (r2's 2.30
                # us/step "matmul-only" was an 8x-narrowed artifact)
                acc = jnp.zeros((Rt, 1), jnp.float32)
                for d in range(D - 1, -1, -1):
                    n = (1 << d) * TR
                    width = min(CH, max(n, LANE))
                    for c in range(_cdiv(n, CH)):
                        diff = cond_chunk(d, c * CH, width)
                        acc = acc + jnp.sum(
                            diff.astype(jnp.float32), axis=1, keepdims=True)
                out_ref[0] = acc
                return

            # fold mode: one real matmul gives a diff pool; per-chunk conds
            # are compare-on-slice (rotating offset defeats CSE)
            pool = cond_chunk(D - 1, 0, CH)  # [Rt, CH] int32
            w = None
            new_w = []
            for d in range(D - 1, -1, -1):
                n = (1 << d) * TR
                width = min(CH, max(n, LANE))
                n_chunks = _cdiv(n, CH)
                for c in range(n_chunks):
                    off = (d * 131 + c * 37) % (CH - width + 1) if CH > width else 0
                    cnd = pool[:, off : off + width] >= (d * 7 + c)
                    if w is None and n >= CH:
                        lo = jnp.broadcast_to(
                            leaf_ref[:, c * CH : (c + 1) * CH], (Rt, CH))
                        hi = jnp.broadcast_to(
                            leaf_ref[:, n + c * CH : n + (c + 1) * CH],
                            (Rt, CH))
                    elif w is None:
                        lo = jnp.broadcast_to(leaf_ref[:, :n], (Rt, n))
                        hi = jnp.broadcast_to(leaf_ref[:, n : 2 * n], (Rt, n))
                        cnd = cnd[:, :n]
                    elif n >= CH:
                        lo, hi = w[c], w[c + n_chunks]
                    else:
                        lo, hi = w[0][:, :n], w[0][:, n : 2 * n]
                        cnd = cnd[:, :n]
                    new_w.append(jnp.where(cnd, hi, lo))
                    if c == n_chunks - 1:  # level complete
                        w = new_w
                        new_w = []
            partial = jnp.sum(w[0], axis=1, keepdims=True)
            for c in range(1, len(w)):
                partial = partial + jnp.sum(w[c], axis=1, keepdims=True)
            out_ref[0] = partial

        def margins(tables, planes_pad):
            rws = planes_pad.shape[0]
            grid = (n_tiles, rws // Rt)
            in_specs = [pl.BlockSpec((Rt, LANE * G), lambda t, r: (r, 0),
                                     memory_space=pltpu.VMEM)]
            for d in range(D):
                in_specs += [pl.BlockSpec((LANE * G, cfg.seg[d]),
                                          lambda t, r: (0, t),
                                          memory_space=pltpu.VMEM)]
            in_specs += [pl.BlockSpec((1, cfg.leaf_seg), lambda t, r: (0, t),
                                      memory_space=pltpu.VMEM)]
            out_spec = pl.BlockSpec((1, Rt, 1), lambda t, r: (t, r, 0),
                                    memory_space=pltpu.VMEM)
            partials = pl.pallas_call(
                kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((n_tiles, rws, 1), jnp.float32),
                interpret=interpret, **compile_kwargs(interpret),
            )(planes_pad, *tables)
            return jnp.sum(partials[:, :, 0], axis=0)

        return margins

    def chain(margin_fn, planes):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(tables, pl_, k):
            def body(_, acc):
                pp = pl_ + (acc[:1, None] * 0).astype(jnp.int8)
                return margin_fn(tables, pp)

            return jax.lax.fori_loop(
                0, k, body, jnp.zeros(pl_.shape[0], jnp.float32))

        return lambda k: run(eng.tables, planes, k)

    t, _ = slope(chain(lambda tb, pp: eng._margins_planes(tb, pp), planes16))
    results["real_planes_us"] = t * 1e6 / rows
    results["real_per_step_us"] = t * 1e6 / n_steps

    t, _ = slope(chain(variant_margins("matmul"), planes16))
    results["matmul_only_per_step_us"] = t * 1e6 / n_steps

    t, _ = slope(chain(variant_margins("fold"), planes16))
    results["fold_only_per_step_us"] = t * 1e6 / n_steps

    # ---------------- transform-only chain ----------------
    @functools.partial(jax.jit, static_argnames=("k",))
    def transform_k(rank_tables, data, k):
        def body(_, acc):
            pls = eng._transform(rank_tables, data + acc[0] * 0.0)
            return jnp.zeros(data.shape[0], jnp.float32) + pls[
                : data.shape[0], 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros(data.shape[0], jnp.float32))

    t, _ = slope(lambda k: transform_k(eng.rank_tables, data_d, k))
    results["transform_only_us"] = t * 1e6 / rows

    t, _ = slope(lambda k: eng.predict_k(data_d, k))
    results["real_full_us"] = t * 1e6 / rows

    # ---------------- shipping-config MFU (VERDICT r3 #6) ----------------
    # the bench.py headline engine; achieved int8 TMAC/s = the exact MAC
    # count its matmuls perform (every column of every level matrix, incl.
    # 128-lane padding, once per row) over the measured plane-resident time
    ship = RankFoldEngine(forest, row_tile=2048, tree_tile=128,
                          split_level=4, col_chunk=2048,
                          transform_row_tile=2048, interpret=interpret,
                          limits=TpuLimits())
    mat_cols = sum(int(tb.shape[-1]) for tb in ship.tables[:-1])
    macs_per_row = mat_cols * 128 * ship.groups

    import functools as _ft

    @_ft.partial(jax.jit, static_argnames=("k",))
    def ship_planes_k(tables, pl_, k):
        def body(_, acc):
            pp = pl_ + (acc[:1, None] * 0).astype(jnp.int8)
            return ship._margins_planes(tables, pp)

        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros(pl_.shape[0], jnp.float32))

    planes_ship = jax.device_put(jnp.asarray(quantize.encode_rank_planes_np(
        quantize.transform_rows_np(ship.q, data))))
    t, _ = slope(lambda k: ship_planes_k(ship.tables, planes_ship, k))
    results["ship_planes_us"] = t * 1e6 / rows
    results["ship_achieved_tmacs"] = macs_per_row * rows / t / 1e12
    t, _ = slope(lambda k: ship.predict_k(data_d, k))
    results["ship_full_us"] = t * 1e6 / rows
    results["ship_macs_per_row"] = macs_per_row

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
