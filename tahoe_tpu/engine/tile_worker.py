"""Subprocess tile-config benchmark worker: time ONE engine config.

Same isolation rationale as bench_worker.py (the remote runtime device-caches
only the first large executable per process), but parameterized over kernel
tile shapes instead of strategy names — the measurement backend for tile
autotuning (the TPU analog of the reference enumerating launch configs).

Protocol: flags on argv; stdout = one JSON line
{us_per_sample, max_err, correct, rows, config...}.
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--engine", choices=["fold", "rank"], required=True)
    p.add_argument("--rows", type=int, default=16384)
    p.add_argument("--trees", type=int, default=500)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--cols", type=int, default=18)
    p.add_argument("--row-tile", type=int, default=256)
    p.add_argument("--tree-tile", type=int, default=64)
    p.add_argument("--col-chunk", type=int, default=None,
                   help="rank: matmul column chunk (None = engine default)")
    p.add_argument("--split-level", type=int, default=None,
                   help="fold/rank subtree split level (None = engine auto)")
    p.add_argument("--cond-lead", type=int, default=0,
                   help="rank: issue next level's cond matmuls before this "
                        "level's selects (MXU/VPU overlap)")
    p.add_argument("--chunk-lead", type=int, default=0,
                   help="rank: one-chunk cond lookahead (finer-grain overlap)")
    p.add_argument("--tree-outer", type=int, default=None,
                   help="rank: 1/0 force tree-outer grid (None = engine auto)")
    p.add_argument("--planes", action="store_true",
                   help="rank: time the plane-resident serving path instead "
                        "of full predict")
    p.add_argument("--vmem-fraction", type=float, default=1.2,
                   help="TpuLimits vmem_fraction for the engine budget")
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--missing-prob", type=float, default=0.02)
    args = p.parse_args(argv)

    try:
        result = run(args)
    except Exception as e:  # report failures as data, not tracebacks
        result = {"error": f"{type(e).__name__}: {e}"}
    result.update(engine=args.engine, rows=args.rows, row_tile=args.row_tile,
                  tree_tile=args.tree_tile, split_level=args.split_level)
    print(json.dumps(result), flush=True)
    return 0


def run(args) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tahoe_tpu.config import ORACLE_ATOL, TpuLimits
    from tahoe_tpu.engine.bench_worker import timed_epoch_seconds
    from tahoe_tpu.forest import compiler, synthetic
    from tahoe_tpu.ops import oracle

    forest = synthetic.generate_forest(args.trees, args.depth, args.cols,
                                       seed=args.seed)
    data = synthetic.generate_data(args.rows, args.cols,
                                   missing_prob=args.missing_prob, seed=1)
    want = oracle.predict(forest, data)
    interpret = jax.default_backend() == "cpu"
    limits = TpuLimits(vmem_fraction=args.vmem_fraction)

    if args.engine == "fold":
        from tahoe_tpu.ops.fold_kernel import FoldKernelEngine

        eng = FoldKernelEngine(compiler.levelize(forest),
                               row_tile=args.row_tile,
                               tree_tile=args.tree_tile,
                               split_level=args.split_level,
                               interpret=interpret, limits=limits)
    else:
        from tahoe_tpu.ops.rank_kernel import RankFoldEngine

        eng = RankFoldEngine(forest, row_tile=args.row_tile,
                             tree_tile=args.tree_tile,
                             split_level=args.split_level,
                             cond_lead=bool(args.cond_lead),
                             chunk_lead=bool(args.chunk_lead),
                             tree_outer=(None if args.tree_outer is None
                                         else bool(args.tree_outer)),
                             col_chunk=args.col_chunk,
                             interpret=interpret, limits=limits)

    data_d = jax.device_put(jnp.asarray(data, jnp.float32))
    if args.planes:
        planes_d = jax.jit(eng._transform)(eng.rank_tables, data_d)
        planes_d.block_until_ready()

        class _PlanesChain:
            def predict_k(self, _data, k):
                return eng._predict_planes_k(eng.tables, planes_d, k=k)

        dt = timed_epoch_seconds(_PlanesChain(), data_d,
                                 warmup=args.warmup, epochs=args.epochs)
        preds = eng.predict_planes(planes_d)[: args.rows]
    else:
        dt = timed_epoch_seconds(eng, data_d, warmup=args.warmup,
                                 epochs=args.epochs)
        preds = eng.predict(data_d)
    err = float(np.abs(np.asarray(preds) - want).max())
    return {
        "us_per_sample": dt * 1e6 / args.rows,
        "max_err": err,
        "correct": bool(err <= ORACLE_ATOL),
        "split_used": getattr(eng, "split_level", 0),
    }


if __name__ == "__main__":
    sys.exit(main())
