"""Per-grid-step overhead audit for the SUSY-class rank config (one process).

Decomposes the headline rank kernel's time into
  (a) grid/dispatch overhead  — no-op kernel, same grid, no table streaming
  (b) table-stream (DMA) floor — same grid + same BlockSpecs, trivial VPU body
  (c) the real kernel
and, in the SAME session (chip throughput drifts ~30% between sessions),
measures 16384- vs 65536-row batches for the full and plane-resident paths.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 900 \
      python scripts/overhead_bench.py [--skip-big]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--skip-big", action="store_true")
    p.add_argument("--rows", type=int, default=16384)
    p.add_argument("--big-rows", type=int, default=65536)
    p.add_argument("--epochs", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tahoe_tpu.config import TpuLimits
    from tahoe_tpu.forest import quantize, synthetic
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.ops.fold_kernel import LANE
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

    def chain(margin_fn, planes):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(tables, pl_, k):
            def body(_, acc):
                pp = pl_ + (acc[:1, None] * 0).astype(jnp.int8)
                return margin_fn(tables, pp)

            return jax.lax.fori_loop(
                0, k, body, jnp.zeros(pl_.shape[0], jnp.float32))

        return lambda k: run(eng.tables, planes, k)

    def planes_for(rows, data):
        return jax.device_put(jnp.asarray(quantize.encode_rank_planes_np(
            quantize.transform_rows_np(eng.q, data))))

    data = synthetic.generate_data(args.rows, 18, missing_prob=0.02, seed=1)
    data_d = jax.device_put(jnp.asarray(data, jnp.float32))
    planes16 = planes_for(args.rows, data)

    # ---- (c) real kernel, plane-resident (control) ----
    t, k2 = slope(chain(lambda tb, pp: eng._margins_planes(tb, pp), planes16))
    results["real_planes_16k_us"] = t * 1e6 / args.rows
    n_steps = (cfg.padded_trees // cfg.tree_tile) * (
        planes16.shape[0] // cfg.row_tile)
    results["grid_steps"] = n_steps
    results["real_per_step_us"] = t * 1e6 / n_steps

    # ---- (a)/(b) no-op and DMA-only kernels, same grid ----
    G = cfg.groups
    Rt = cfg.row_tile
    n_tiles = cfg.padded_trees // cfg.tree_tile

    def noop_margins(stream_tables: bool):
        def kernel(p_ref, *refs):
            out_ref = refs[-1]
            acc = jnp.sum(p_ref[:].astype(jnp.float32), axis=1,
                          keepdims=True)
            if stream_tables:
                # touch one sublane of every streamed block (cheap VPU) so
                # the copies can't be elided, without any MXU work
                for mr in refs[:-2]:
                    acc = acc + jnp.sum(
                        mr[0:1, 0:LANE].astype(jnp.float32))
                acc = acc + jnp.sum(refs[-2][0:1, 0:LANE])
            out_ref[0] = acc

        def margins(tables, planes_pad):
            rows = planes_pad.shape[0]
            grid = (n_tiles, rows // Rt)
            in_specs = [pl.BlockSpec((Rt, LANE * G), lambda t_, r: (r, 0),
                                     memory_space=pltpu.VMEM)]
            ins = (planes_pad,)
            if stream_tables:
                for d in range(cfg.depth):
                    in_specs += [pl.BlockSpec((LANE * G, cfg.seg[d]),
                                              lambda t_, r: (0, t_),
                                              memory_space=pltpu.VMEM)]
                in_specs += [pl.BlockSpec((1, cfg.leaf_seg),
                                          lambda t_, r: (0, t_),
                                          memory_space=pltpu.VMEM)]
                ins = (planes_pad, *tables)
            out_spec = pl.BlockSpec((1, Rt, 1), lambda t_, r: (t_, r, 0),
                                    memory_space=pltpu.VMEM)
            partials = pl.pallas_call(
                kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((n_tiles, rows, 1),
                                               jnp.float32),
                interpret=interpret, **compile_kwargs(interpret),
            )(*ins)
            return jnp.sum(partials[:, :, 0], axis=0)

        return margins

    t_noop, _ = slope(chain(noop_margins(False), planes16))
    results["noop_per_step_us"] = t_noop * 1e6 / n_steps
    results["noop_16k_us"] = t_noop * 1e6 / args.rows

    t_dma, _ = slope(chain(noop_margins(True), planes16))
    results["dma_per_step_us"] = t_dma * 1e6 / n_steps
    results["dma_16k_us"] = t_dma * 1e6 / args.rows

    # ---- full predict control at 16k ----
    t_full, _ = slope(lambda k: eng.predict_k(data_d, k))
    results["real_full_16k_us"] = t_full * 1e6 / args.rows

    # ---- 65536-row batch ----
    if not args.skip_big:
        big = synthetic.generate_data(args.big_rows, 18, missing_prob=0.02,
                                      seed=2)
        big_d = jax.device_put(jnp.asarray(big, jnp.float32))
        t0 = time.perf_counter()
        want = oracle.predict(forest, big)
        results["oracle_big_s"] = time.perf_counter() - t0
        planes_big = planes_for(args.big_rows, big)
        t, _ = slope(chain(
            lambda tb, pp: eng._margins_planes(tb, pp), planes_big))
        results["real_planes_64k_us"] = t * 1e6 / args.big_rows
        t, _ = slope(lambda k: eng.predict_k(big_d, k))
        results["real_full_64k_us"] = t * 1e6 / args.big_rows
        preds = eng.predict(big_d)
        results["big_max_err"] = float(
            np.abs(np.asarray(preds) - want).max())

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
