"""Per-strategy feasibility predicates.

The reference pre-checks shared-memory feasibility before benchmarking
strategies 4/5 and skips infeasible ones with acc=FLT_MAX
(BaseTahoeTest.h:657-679; hard asserts in kernels, Struct.h:550-552). The TPU
analog: VMEM budgets for the Pallas tile strategies, feature-lane limits for
the fold kernel, and memory sanity for the jnp engines.
"""
from __future__ import annotations

from typing import Optional, Tuple

from tahoe_tpu.config import Strategy, TpuLimits
from tahoe_tpu.forest.spec import ForestSpec
from tahoe_tpu.ops.fold_kernel import LANE, FoldKernelEngine


def default_tiles(strategy: Strategy, forest: ForestSpec,
                  limits: TpuLimits = TpuLimits()) -> Tuple[int, int]:
    """(row_tile, tree_tile) defaults per strategy.

    VMEM_FOREST pins the whole forest per grid cell (SHARED_FOREST analog);
    SPLIT_FOREST chunks trees (SPLIT_FOREST analog). Row tiles then shrink to
    fit the budget.
    """
    trees = forest.num_trees
    if strategy == Strategy.VMEM_FOREST:
        tree_tile = max(8, trees)
    else:
        # power-of-2 like the engine's internal rounding (fold_kernel tt)
        tree_tile = 1 << (min(64, max(8, trees)) - 1).bit_length()
    ge_ok = 2 * forest.num_cols <= LANE
    row_tile = 256
    while FoldKernelEngine.min_vmem_bytes(
        forest.depth, row_tile, tree_tile, ge_ok
    ) > limits.usable_vmem:
        # Shrink the tree chunk first (SPLIT_FOREST semantics): level tables
        # stream once per row tile, so tiny row tiles multiply HBM traffic,
        # while tree chunks only change the accumulation grid. The reference
        # makes the same trade by capping trees_per_sm (Struct.h:2103-2164).
        if strategy != Strategy.VMEM_FOREST and tree_tile > 8:
            tree_tile //= 2
        elif row_tile > 8:
            row_tile //= 2
        else:
            break
    return row_tile, tree_tile


def check(strategy: Strategy, forest: ForestSpec,
          limits: TpuLimits = TpuLimits()) -> Optional[str]:
    """None if feasible, else a human-readable reason (the strategy is then
    skipped with cost=inf, mirroring the reference's acc=FLT_MAX)."""
    if strategy in (Strategy.VMEM_FOREST, Strategy.SPLIT_FOREST):
        if forest.num_cols > LANE:
            return f"fold kernel needs <= {LANE} features, forest has {forest.num_cols}"
        row_tile, tree_tile = default_tiles(strategy, forest, limits)
        need = FoldKernelEngine.min_vmem_bytes(
            forest.depth, row_tile, tree_tile, 2 * forest.num_cols <= LANE
        )
        if need > limits.usable_vmem:
            return (
                f"needs ~{need / 2**20:.1f} MiB VMEM per tile "
                f"(budget {limits.usable_vmem / 2**20:.1f} MiB)"
            )
    if strategy in (Strategy.TENSOR, Strategy.ROW_TILED):
        # leveled form materializes 2^depth leaves per tree
        if forest.depth > 14:
            return f"leveled form of depth {forest.depth} is too large"
    if strategy == Strategy.RANK_MXU:
        from tahoe_tpu.forest.compiler import RANK_MAX, RANK_MAX_COLS
        from tahoe_tpu.ops.rank_kernel import RankFoldEngine

        if forest.num_cols > RANK_MAX_COLS:
            return f"rank-MXU form supports <= {RANK_MAX_COLS} features"
        # distinct thresholds per feature must fit the two-plane encoding
        internal = ~forest.is_leaf
        import numpy as np

        for f in range(forest.num_cols):
            m = internal & (forest.fids == f)
            if m.any() and np.unique(forest.values[m]).size > RANK_MAX:
                return f"feature {f} has > {RANK_MAX} distinct thresholds"
        row_tile, tree_tile = 128, 64
        need = RankFoldEngine.vmem_bytes(forest.depth, row_tile, tree_tile)
        if need > limits.usable_vmem * 1.5:
            return (
                f"needs ~{need / 2**20:.1f} MiB VMEM per tile "
                f"(budget {limits.usable_vmem / 2**20:.1f} MiB)"
            )
    return None
