"""Per-strategy feasibility predicates.

The reference pre-checks shared-memory feasibility before benchmarking
strategies 4/5 and skips infeasible ones with acc=FLT_MAX
(BaseTahoeTest.h:657-679; hard asserts in kernels, Struct.h:550-552). The TPU
analog: VMEM budgets for the Pallas tile strategies, feature-lane limits for
the fold kernel, and memory sanity for the jnp engines.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

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
    ge_ok = 2 * forest.num_cols <= LANE
    if strategy == Strategy.VMEM_FOREST:
        # pow2 like the engine's internal rounding — sizing with the raw
        # tree count let infeasible configs through (engine rounds up)
        tree_tile = 1 << (max(8, trees) - 1).bit_length()
        row_tile = 256
        while row_tile > 8 and FoldKernelEngine.min_vmem_bytes(
            forest.depth, row_tile, tree_tile, ge_ok, trees
        ) > limits.fold_usable_vmem:
            row_tile //= 2
        return row_tile, tree_tile
    # SPLIT_FOREST: measured preference order on v5e (scripts/tile_sweep.py).
    # Wide tiles first — select-fold efficiency needs full 128-lane widths;
    # for deep forests the feasibility filter walks down to small row tiles
    # with large tree chunks (a single tree tile also avoids the table
    # double-buffer, e.g. depth-13 best was (64, 64)).
    prefs = [
        (128, 128), (128, 64), (256, 64), (64, 128), (64, 64), (256, 32),
        (128, 32), (64, 32), (256, 16), (128, 16), (64, 16), (256, 8),
        (128, 8), (64, 8), (32, 8), (16, 8), (8, 8),
    ]
    for row_tile, tree_tile in prefs:
        tt = 1 << (min(tree_tile, max(8, trees)) - 1).bit_length()
        if FoldKernelEngine.min_vmem_bytes(
            forest.depth, row_tile, tt, ge_ok, trees
        ) <= limits.fold_usable_vmem:
            return row_tile, tt
    return 8, 8


def check(strategy: Strategy, forest: ForestSpec,
          limits: TpuLimits = TpuLimits()) -> Optional[str]:
    """None if feasible, else a human-readable reason (the strategy is then
    skipped with cost=inf, mirroring the reference's acc=FLT_MAX)."""
    if strategy in (Strategy.VMEM_FOREST, Strategy.SPLIT_FOREST):
        if forest.num_cols > LANE:
            return f"fold kernel needs <= {LANE} features, forest has {forest.num_cols}"
        if forest.depth > 14:
            # the fully-unrolled fold at depth 15 blows up Mosaic compile
            # time (>8 min measured on v5e — effectively a hang; the rank
            # engine's subtree-split mode covers these forests)
            return f"fold kernel compile explodes beyond depth 14 (depth {forest.depth})"
        row_tile, tree_tile = default_tiles(strategy, forest, limits)
        need = FoldKernelEngine.min_vmem_bytes(
            forest.depth, row_tile, tree_tile, 2 * forest.num_cols <= LANE,
            forest.num_trees,
        )
        if need > limits.fold_usable_vmem:
            return (
                f"needs ~{need / 2**20:.1f} MiB VMEM per tile "
                f"(budget {limits.fold_usable_vmem / 2**20:.1f} MiB)"
            )
    if strategy in (Strategy.TENSOR, Strategy.ROW_TILED):
        # leveled form materializes 2^depth leaves per tree
        if forest.depth > 14:
            return f"leveled form of depth {forest.depth} is too large"
    if strategy == Strategy.DEPTH_BUCKETED:
        from tahoe_tpu.forest.compiler import reachable_depths

        if forest.num_cols > LANE:
            return f"fold kernel needs <= {LANE} features, forest has {forest.num_cols}"
        depths = reachable_depths(forest)
        if np.unique(depths).size < 2:
            return (
                "uniform tree depth — identical work to SPLIT_FOREST"
            )
        row_tile, tree_tile = default_tiles(Strategy.SPLIT_FOREST, forest,
                                            limits)
        need = FoldKernelEngine.min_vmem_bytes(
            int(depths.max()), row_tile, min(tree_tile, 8),
            2 * forest.num_cols <= LANE, forest.num_trees,
        )
        if need > limits.fold_usable_vmem:
            return (
                f"deepest bucket needs ~{need / 2**20:.1f} MiB VMEM "
                f"(budget {limits.fold_usable_vmem / 2**20:.1f} MiB)"
            )
    if strategy == Strategy.RANK_MXU:
        from tahoe_tpu.forest.compiler import RANK_MAX_COLS
        from tahoe_tpu.ops.rank_kernel import RankFoldEngine

        if forest.num_cols > RANK_MAX_COLS:
            return f"rank-MXU form supports <= {RANK_MAX_COLS} features"
        # features with too many distinct thresholds split into banded
        # virtual features (quantize.band_split); total bands must fit the
        # plane-group budget
        vcols = rank_virtual_cols(forest)
        if vcols > RANK_MAX_COLS:
            return (
                f"forest needs {vcols} banded virtual features "
                f"> {RANK_MAX_COLS}"
            )
        row_tile, tree_tile = rank_default_tiles(forest, limits)
        if row_tile is None:
            need = RankFoldEngine.min_vmem_bytes(forest.depth, 64, 8)
            return (
                f"needs ~{need / 2**20:.1f} MiB VMEM per tile "
                f"(budget {limits.usable_vmem / 2**20:.1f} MiB)"
            )
    return None


def rank_virtual_cols(forest: ForestSpec) -> int:
    """Virtual feature count after rank band splitting (= num_cols when every
    feature has <= RANK_MAX distinct thresholds)."""
    import numpy as np

    from tahoe_tpu.forest.compiler import RANK_MAX

    internal = ~forest.is_leaf
    total = 0
    for f in range(forest.num_cols):
        m = internal & (forest.fids == f)
        k = int(np.unique(forest.values[m]).size) if m.any() else 0
        total += max(1, -(-k // RANK_MAX))
    return total


def rank_default_tiles(forest: ForestSpec, limits: TpuLimits = TpuLimits()):
    """(row_tile, tree_tile) for the rank-MXU engine, or (None, None) when
    nothing fits.

    Whole-level (split 0) configs are preferred over ANY subtree-split
    config: split mode re-streams the bottom-level matrices for every row
    tile, and whole-level measured 23-25% faster wherever both fit (deep-12
    0.54 vs 0.70, deep-13 1.12 vs 1.49 us/sample on v5e). Among whole-level
    configs the preference order is the measured v5e ranking — (256, 128)
    best on SUSY-class, (128, 16/8) for deep forests where the select
    frontier dominates the budget. The engine then re-derives the split
    level from the same estimates."""
    from tahoe_tpu.forest.compiler import rank_groups
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    g = rank_groups(rank_virtual_cols(forest))
    budget = limits.usable_vmem
    prefs = [(256, 128), (128, 128), (128, 64), (128, 32), (128, 16),
             (128, 8), (64, 32), (64, 16), (64, 8), (256, 16),
             (32, 8), (16, 8)]
    fallback = None
    for rt, tt in prefs:
        tt2 = 1 << (min(tt, max(8, forest.num_trees)) - 1).bit_length()
        if RankFoldEngine.vmem_bytes(forest.depth, rt, tt2, g, 0) <= budget:
            return rt, tt2
        if fallback is None and RankFoldEngine.min_vmem_bytes(
            forest.depth, rt, tt2, g
        ) <= budget:
            fallback = (rt, tt2)
    return fallback if fallback is not None else (None, None)
