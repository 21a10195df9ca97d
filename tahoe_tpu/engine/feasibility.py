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
from tahoe_tpu.ops.fold_kernel import LANE, MAX_SIGN_COLS, FoldKernelEngine


def fold_cols(forest: ForestSpec) -> Tuple[int, bool, int, bool]:
    """(live_cols, ge_ok, vregs, sign_form) for the fold engines, mirroring
    FoldKernelEngine's auto compaction + ge-form choice."""
    from tahoe_tpu.forest.compiler import used_features

    cols = forest.num_cols
    if cols > LANE or 2 * cols > LANE:
        cols = max(1, used_features(forest).size)
    ge_ok = cols <= MAX_SIGN_COLS
    sign = ge_ok and 2 * cols > LANE
    vregs = -(-cols // LANE) if sign else 1
    return cols, ge_ok, vregs, sign


def resident_table_bytes(forest: ForestSpec) -> int:
    """Bytes of node tables a VMEM_FOREST grid cell holds resident.

    The single source of truth for the perf model's VMEM-residency penalty
    (ADVICE r4 #3): derived from the SAME sizing the fold engine uses — the
    engine's pow2 whole-forest tree tile (default_tiles' VMEM_FOREST branch)
    and fold_cols' vreg count, with FoldKernelEngine's ge-form per-node
    layout (thresh f32 + fid i32 per vreg) plus the f32 leaf table. The
    250 KB / x1.12 constants in perf_model.model were calibrated against
    exactly this formula on the r7 sweep's VMEM-vs-SPLIT pairs."""
    tt_full = 1 << (max(8, forest.num_trees) - 1).bit_length()
    _, _, vregs, _ = fold_cols(forest)
    per_tree = ((1 << forest.depth) - 1) * 8 * max(1, vregs) \
        + (1 << forest.depth) * 4
    return tt_full * per_tree


def default_tiles(strategy: Strategy, forest: ForestSpec,
                  limits: TpuLimits = TpuLimits()) -> Tuple[int, int]:
    """(row_tile, tree_tile) defaults per strategy.

    VMEM_FOREST pins the whole forest per grid cell (SHARED_FOREST analog);
    SPLIT_FOREST chunks trees (SPLIT_FOREST analog). Row tiles then shrink to
    fit the budget.
    """
    trees = forest.num_trees
    _, ge_ok, vregs, sign = fold_cols(forest)
    if strategy == Strategy.VMEM_FOREST:
        # pow2 like the engine's internal rounding — sizing with the raw
        # tree count let infeasible configs through (engine rounds up)
        tree_tile = 1 << (max(8, trees) - 1).bit_length()
        row_tile = 256
        while row_tile > 8 and FoldKernelEngine.min_vmem_bytes(
            forest.depth, row_tile, tree_tile, ge_ok, trees,
            vregs=vregs, sign_form=sign,
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
            forest.depth, row_tile, tt, ge_ok, trees,
            vregs=vregs, sign_form=sign,
        ) <= limits.fold_usable_vmem:
            return row_tile, tt
    return 8, 8


def check(strategy: Strategy, forest: ForestSpec,
          limits: TpuLimits = TpuLimits()) -> Optional[str]:
    """None if feasible, else a human-readable reason (the strategy is then
    skipped with cost=inf, mirroring the reference's acc=FLT_MAX)."""
    if strategy in (Strategy.VMEM_FOREST, Strategy.SPLIT_FOREST):
        cols, ge_ok, vregs, sign = fold_cols(forest)
        if cols > MAX_SIGN_COLS:
            return (f"fold kernel needs <= {MAX_SIGN_COLS} live features, "
                    f"forest has {cols} — RANK_MXU covers <= 480 banded "
                    f"virtual features; TENSOR/ROW_TILED remain as exact "
                    f"(15-30x slower) fallbacks")
        row_tile, tree_tile = default_tiles(strategy, forest, limits)
        # compile-time wall as a first-class infeasibility reason (VERDICT
        # r3 weak #3): whole-level unrolls explode past depth 14; the r4
        # subtree-group grid caps the per-step unroll at 2^Db, so a config
        # is compile-feasible iff SOME unwalled split level exists
        cands = FoldKernelEngine.valid_split_levels(
            forest.depth, tree_tile, ge_ok)
        if all(FoldKernelEngine.compile_wall(forest.depth, ls)
               for ls in cands):
            return (
                f"no fold configuration compiles in bounded time at depth "
                f"{forest.depth} with tree_tile {tree_tile} "
                f"(whole-level walled > {FoldKernelEngine.MAX_UNSPLIT_DEPTH}"
                f", split bottoms walled > "
                f"{FoldKernelEngine.MAX_SPLIT_BOTTOM} levels)"
            )
        need = FoldKernelEngine.min_vmem_bytes(
            forest.depth, row_tile, tree_tile, ge_ok, forest.num_trees,
            vregs=vregs, sign_form=sign,
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
    if strategy == Strategy.HBM_DIRECT:
        # dense complete-tree tables blow up with depth regardless of real
        # node count (Struct.h:19-21 pays the same); cap the packed upload
        from tahoe_tpu.config import forest_num_nodes

        dense_bytes = forest_num_nodes(forest.num_trees, forest.depth) * 8
        if dense_bytes > 2 << 30:
            return (f"dense node tables ~{dense_bytes / 2**30:.1f} GiB "
                    f"(complete-tree storage at depth {forest.depth})")
    if strategy == Strategy.SPARSE:
        from tahoe_tpu.forest.compiler import reachable_mask

        pool = int(reachable_mask(forest).sum())
        if pool * 16 > 2 << 30:
            return f"sparse node pool ~{pool * 16 / 2**30:.1f} GiB"
    if strategy == Strategy.DEPTH_BUCKETED:
        from tahoe_tpu.forest.compiler import reachable_depths

        cols, ge_ok, vregs, sign = fold_cols(forest)
        if cols > MAX_SIGN_COLS:
            return (f"fold kernel needs <= {MAX_SIGN_COLS} live features, "
                    f"forest has {cols}")
        depths = reachable_depths(forest)
        if np.unique(depths).size < 2:
            return (
                "uniform tree depth — identical work to SPLIT_FOREST"
            )
        row_tile, tree_tile = default_tiles(Strategy.SPLIT_FOREST, forest,
                                            limits)
        need = FoldKernelEngine.min_vmem_bytes(
            int(depths.max()), row_tile, min(tree_tile, 8), ge_ok,
            forest.num_trees, vregs=vregs, sign_form=sign,
        )
        if need > limits.fold_usable_vmem:
            return (
                f"deepest bucket needs ~{need / 2**20:.1f} MiB VMEM "
                f"(budget {limits.fold_usable_vmem / 2**20:.1f} MiB)"
            )
    if strategy == Strategy.RANK_MXU:
        from tahoe_tpu.forest.compiler import RANK_MAX_COLS
        from tahoe_tpu.ops.rank_kernel import RankFoldEngine

        # the engine compacts to live features before quantizing, and
        # features with too many distinct thresholds split into banded
        # virtual features (quantize.band_split); total bands (over live
        # features) must fit the plane-group budget
        vcols = rank_virtual_cols(forest)
        if vcols > RANK_MAX_COLS:
            return (
                f"forest needs {vcols} banded virtual live features "
                f"> {RANK_MAX_COLS}"
            )
        row_tile, tree_tile = rank_default_tiles(forest, limits)
        if row_tile is None:
            from tahoe_tpu.forest.compiler import rank_groups

            g = rank_groups(vcols)
            need = RankFoldEngine.min_vmem_bytes(forest.depth, 64, 8, g)
            msg = (
                f"needs ~{need / 2**20:.1f} MiB VMEM per tile "
                f"(budget {limits.usable_vmem / 2**20:.1f} MiB)"
            )
            if g >= 3 and forest.depth >= 8:
                # split levels with depth-Ls >= 7 at G >= 3 are excluded by
                # the measured compile-time wall (rank_kernel.compile_wall)
                msg += ("; deeper split levels excluded by the measured "
                        ">13-min Mosaic compile wall (Db>=7 at G>=3, r2)")
            return msg
    return None


def rank_virtual_cols(forest: ForestSpec) -> int:
    """Virtual feature count after rank band splitting over LIVE features
    (= live count when every feature has <= RANK_MAX distinct thresholds).

    Single lexsort over internal (fid, threshold) pairs instead of a per-
    feature unique() — the per-feature loop was O(F * nodes) and gisette-class
    forests have thousands of columns."""
    from tahoe_tpu.forest.compiler import RANK_MAX, reachable_mask

    internal = ~forest.is_leaf & reachable_mask(forest)
    if not internal.any():
        return 1
    f = forest.fids[internal].ravel()
    v = forest.values[internal].ravel()
    order = np.lexsort((v, f))
    fs, vs = f[order], v[order]
    new = np.ones(fs.size, bool)
    new[1:] = (fs[1:] != fs[:-1]) | (vs[1:] != vs[:-1])
    k = np.bincount(fs[new], minlength=forest.num_cols)
    live = np.unique(fs)
    return int(sum(max(1, -(-int(k[ff]) // RANK_MAX)) for ff in live))


def rank_default_tiles(forest: ForestSpec, limits: TpuLimits = TpuLimits()):
    """(row_tile, tree_tile) for the rank-MXU engine, or (None, None) when
    nothing fits.

    Preference order is the measured ranking (scripts/ls_sweep2-4.py, r2):
    BIG row tiles first, letting the engine pick the smallest fitting split
    level — the kernel's matmuls are MXU weight-load bound below ~1024 rows
    per dot, and the subtree-split form keeps fold chains vreg-resident
    (SUSY-class: rt1024/tt128 auto-split ls4 0.111 vs whole-level rt256
    0.133 us/sample same-session; stream-chunk mode removed split's old
    re-streaming penalty). Acceptance therefore uses the min VMEM over split
    levels; deep forests fall through to the small-row-tile entries."""
    from tahoe_tpu.forest.compiler import rank_groups
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    g = rank_groups(rank_virtual_cols(forest))
    budget = limits.usable_vmem
    # Depth >= 13 uses measured per-depth preferences (r4_deep{,2}.py, fresh
    # same-session enumerations — VERDICT r3 #2: the big-rt-first list below
    # generalizes badly there):
    #   deep13: (128,8) whole-level ls0 1.15 us/sample vs the old pick's
    #           2.17 (tt64 ls6); deep14: (512,4) ls8 2.18 (derate_probe —
    #           the Db<=6 budget unlock) vs 2.27 at (256,4); deep15:
    #           (1024,1) ls9 2.13 vs 2.23 at (256,1) ls0.
    # Small tree tiles keep the whole-level form (or a shallow-bottom split)
    # within VMEM where depth doubles the per-tree node count.
    if forest.depth >= 15:
        prefs = [(1024, 1), (512, 1), (256, 1), (128, 1), (256, 4), (64, 8),
                 (32, 8), (16, 8)]
    elif forest.depth == 14:
        prefs = [(512, 4), (512, 8), (256, 4), (256, 8), (128, 8), (256, 1),
                 (128, 1), (64, 8), (32, 8), (16, 8)]
    elif forest.depth == 13:
        prefs = [(128, 8), (256, 4), (128, 16), (64, 8), (256, 1), (32, 8),
                 (16, 8)]
    else:
        prefs = [(1024, 128), (512, 128), (256, 128), (128, 128), (128, 64),
                 (128, 32), (128, 16), (128, 8), (64, 32), (64, 16), (64, 8),
                 (256, 16), (32, 8), (16, 8)]
    for rt, tt in prefs:
        tt2 = 1 << (min(tt, max(8, forest.num_trees)) - 1).bit_length()
        if RankFoldEngine.min_vmem_bytes(
            forest.depth, rt, tt2, g
        ) <= budget:
            return rt, tt2
    return (None, None)
