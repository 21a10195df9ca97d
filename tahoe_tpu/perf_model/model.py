"""Analytical performance model: predict the best strategy before running.

The TPU re-derivation of the reference's closed-form model (main.cu:22-82):
per-strategy cost = work terms scaled by measured machine constants, argmin
picks the strategy. The reference's terms count smem/gmem transactions per
traversal step with one measured bandwidth; hand-counting doesn't transfer to
XLA-compiled kernels, so the terms here are the *work shapes* of each engine
family (nodes visited, gather steps, table bytes streamed) scaled by
per-element latencies calibrated from micro-runs (calibrate.py):

  HBM_DIRECT    rows * trees * (depth+1)   gather steps
  ROW_TILED     rows * trees * 2^depth     nodes through the XLA fold
  TENSOR        same nodes + one-hot MXU matmul at HIGHEST precision
  VMEM_FOREST   rows * trees * 2^depth     nodes through the fused kernel
  SPLIT_FOREST  same + an extra table-streaming term per extra tree tile

Like the reference, the model is validated against exhaustive enumeration
(autotune.enumerate_strategies) and the CLI prints "predicts
correctly/incorrectly" (main.cu:85-90).

All costs are per predict() call in seconds, for ``rows`` samples.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

from tahoe_tpu.config import Strategy, tree_num_nodes
from tahoe_tpu.engine import feasibility
from tahoe_tpu.forest.spec import ForestSpec
from tahoe_tpu.perf_model.calibrate import Calibration

# effective bandwidth of pallas block-streamed tables (vs the contiguous-copy
# rate cal.hbm_gbps measures); fits the stream-bound deep-14/15 rank readings
RANK_STREAM_GBPS = 700.0


@dataclasses.dataclass(frozen=True)
class CostBreakdown:
    compute_s: float
    memory_s: float
    dispatch_s: float

    @property
    def total(self) -> float:
        return self.compute_s + self.memory_s + self.dispatch_s


def _table_bytes(forest: ForestSpec) -> int:
    # ge-mode fold tables: thresh f32 + fid i32 per internal node, leaf f32
    return forest.num_trees * (tree_num_nodes(forest.depth) * 8 + (1 << forest.depth) * 4)


def _rank_transform_cost(forest: ForestSpec, vcols: int, rows: int) -> float:
    """Per-batch rank-transform seconds (rank_transform.py kernels)."""
    import numpy as np

    internal = ~forest.is_leaf
    if internal.any():
        # distinct thresholds per feature in one lexsort pass (a per-feature
        # unique() loop is O(F * nodes) — gisette-class F is in the thousands)
        f = forest.fids[internal].ravel()
        v = forest.values[internal].ravel()
        order = np.lexsort((v, f))
        fs, vs = f[order], v[order]
        new = np.ones(fs.size, bool)
        new[1:] = (fs[1:] != fs[:-1]) | (vs[1:] != vs[:-1])
        k_per_f = np.bincount(fs[new], minlength=forest.num_cols).tolist()
    else:
        k_per_f = [0]
    if max(k_per_f, default=0) > 256 or vcols > 128:
        # bucketed v2 transform: ~constant VPU work per (row, VIRTUAL
        # feature — banding expands columns) regardless of table size;
        # ~1.5 ns measured on v5e at SUSY scale. Forests wider than one
        # vreg (> 128 vcols) are forced onto v2 (group-streamed) too — the
        # engine mirrors this (rank_kernel._build_tables, r5)
        return rows * vcols * 1.5e-9
    # flat compare sweep: fixed ~1.2 ns/(row, feature) of loop + plane
    # assembly, plus ~0.7 ps per (row, distinct threshold). Feature count
    # is LIVE columns (nonzero threshold tables): the engine compacts to
    # live features before transforming, so pricing raw num_cols would
    # overcharge sparse-wide forests ~40x (gisette-class: 120 live of 5000)
    import numpy as np  # noqa: F811 — local, mirrors the top of the fn

    live_cols = int(np.count_nonzero(np.asarray(k_per_f))) or 1
    return rows * (live_cols * 1.2e-9 + sum(k_per_f) * 0.7e-12)


def predict_cost(strategy: Strategy, forest: ForestSpec, rows: int,
                 cal: Calibration) -> Optional[CostBreakdown]:
    """Predicted cost, or None when infeasible (reference: acc=FLT_MAX skip,
    BaseTahoeTest.h:657-679)."""
    if feasibility.check(strategy, forest) is not None:
        return None
    T, D = forest.num_trees, forest.depth
    leaves = 1 << D
    nodes_per_row = T * leaves
    dispatch = cal.dispatch_us / 1e6

    if strategy == Strategy.HBM_DIRECT:
        compute = rows * T * (D + 1) * cal.gather_step_ns / 1e9
        return CostBreakdown(compute, 0.0, dispatch)

    if strategy == Strategy.SPARSE:
        from tahoe_tpu.ops.sparse_kernel import SparseRankEngine

        if SparseRankEngine.feasible(forest) is None and forest.depth > 0:
            # fast tier (ops/sparse_kernel.py): MXU-cond select-chain descent
            # whose work is the PRUNED slot pool, not 2^D. Per (row,
            # tree-lane, slot): ~an eq-compare + 2 selects ~= 2.5x the fold
            # kernel's per-node select cost; plus the int8 cond matmul over
            # live columns. The loop-structured kernel has no pool cap:
            # pools beyond the VMEM budget stream macro blocks per row
            # tile, charged as a surplus over compute (like RANK_MXU).
            import numpy as np

            from tahoe_tpu.config import TpuLimits
            from tahoe_tpu.forest.compiler import (
                rank_groups,
                reachable_mask,
            )

            mask = reachable_mask(forest)
            node_depth = np.floor(np.log2(
                np.arange(1, mask.shape[1] + 1))).astype(np.int32)
            # slot pool = sum over levels of max-over-trees live width (+1
            # dead slot per level, CH-padded) — build_sparse_leveled widths
            per_tree = np.zeros((forest.num_trees, forest.depth + 1), np.int64)
            for t in range(forest.num_trees):
                per_tree[t] = np.bincount(node_depth[mask[t]],
                                          minlength=forest.depth + 1)
            widths = -(-(per_tree.max(axis=0) + 1) // 8) * 8
            slots = int(widths.sum())
            # leaf level L has no matrix columns (select-only)
            summat = int(widths[:-1].sum())
            n_tiles = -(-forest.num_trees // 128)
            lanes = n_tiles * 128
            G = rank_groups(feasibility.rank_virtual_cols(forest))
            compute = rows * lanes * slots * 2.5 * cal.fold_node_ns / 1e9
            # each 128-tree tile runs its own cond matmul over the
            # shared slot pool (ADVICE r2 #3)
            compute += rows * summat * 128.0 * 128 * G * n_tiles / 206e12
            vcols = feasibility.rank_virtual_cols(forest)
            compute += _rank_transform_cost(forest, vcols, rows)
            mats_bytes = n_tiles * summat * 128 * G * 128
            cv_bytes = n_tiles * slots * 128 * 8
            # mirror plan_macro's residency rule: the pipeline only
            # double-buffers the pool when the tree grid has > 1 tile
            # (ADVICE r3 #1 — a single-tile pool at 50-100% of budget is
            # resident in the engine, not streaming)
            dbuf = 2 if n_tiles > 1 else 1
            resident = dbuf * (mats_bytes + cv_bytes) // max(n_tiles, 1)
            memory = 0.0
            if resident > TpuLimits().usable_vmem:
                # streamed macro blocks re-ship per row tile; Pallas
                # double-buffers them against compute — charge the surplus
                from tahoe_tpu.ops.sparse_kernel import (
                    SPARSE_DEFAULT_ROW_TILE,
                )

                passes = max(1.0, rows / SPARSE_DEFAULT_ROW_TILE)
                stream = passes * (mats_bytes + cv_bytes) / (
                    RANK_STREAM_GBPS * 1e9)
                memory = max(0.0, stream - compute)
            return CostBreakdown(compute, memory, dispatch)
        # fallback tier: XLA gather descent over the pruned pool
        compute = rows * T * D * cal.gather_step_ns / 1e9
        return CostBreakdown(compute, 0.0, dispatch)

    if strategy in (Strategy.ROW_TILED, Strategy.TENSOR):
        compute = rows * nodes_per_row * cal.xla_node_ns / 1e9
        if strategy == Strategy.TENSOR:
            # one-hot selection at HIGHEST (6-pass) f32: K padded to 128
            macs = rows * 128.0 * nodes_per_row * 2 * 6
            compute += macs / 49e12  # ~f32-equivalent MXU throughput
        return CostBreakdown(compute, 0.0, dispatch)

    if strategy == Strategy.RANK_MXU:
        from tahoe_tpu.forest.compiler import rank_groups
        from tahoe_tpu.ops.rank_kernel import RankFoldEngine

        vcols = feasibility.rank_virtual_cols(forest)
        G = rank_groups(vcols)
        # the int8 matmul dominates: 128*G MACs/node at ~206 effective int8
        # TOPS, plus a small G-independent VPU residue (compare + select).
        # Fit to whole-level v5e measurements (scripts/ls0*_sweep.sh):
        # SUSY G=1 0.98 ps/node, deep-12 G=1 1.2 ps, deep-13 G=2 1.6 ps;
        # split-mode streaming is charged separately below (it explained the
        # old 4.2 ps deep-14 G=3 reading — stream-bound, not compute-bound)
        compute = rows * nodes_per_row * (
            cal.fold_node_ns / 1e9 * 0.15 + 128.0 * G / 206e12
        )
        # mirror the engine's auto split choice: whole-level (split 0)
        # streams each tree tile's matrices ONCE per predict under the
        # tree-outer grid; subtree-split mode re-streams the bottom-level
        # matrices for EVERY row tile (the dominant deep-forest cost)
        from tahoe_tpu.config import TpuLimits

        rt, tt = feasibility.rank_default_tiles(forest)
        limits = TpuLimits()
        cands = RankFoldEngine.valid_split_levels(forest.depth, tt, G)
        # (mirrors the engine's auto chooser: derated fit budget at G=1 —
        # a measured performance prior — and the Db-conditioned budget at
        # G>=2; see RankFoldEngine.__init__/split_budget)
        def _fit_budget(l):
            if G == 1:
                return RankFoldEngine.split_budget(l, limits)
            return RankFoldEngine.split_budget(l, limits, G, forest.depth)

        ls = next(
            (l for l in cands if RankFoldEngine.vmem_bytes(
                forest.depth, rt, tt, G, l
            ) <= _fit_budget(l)),
            min(cands, key=lambda l: RankFoldEngine.vmem_bytes(
                forest.depth, rt, tt, G, l
            ) / _fit_budget(l)),
        )
        # int8 matrices cover INTERNAL nodes only (2^D - 1 per tree)
        mat_bytes = forest.num_trees * ((1 << forest.depth) - 1) * 128 * G
        passes = max(1.0, rows / rt) if ls else 1.0
        # Pallas double-buffers the streamed tables against compute, so the
        # streaming only costs when it EXCEEDS compute: charge the surplus.
        # Block-streamed pallas loads reach ~700 GB/s on v5e (measured via
        # stream-bound deep-14/15 rank runs), well under the contiguous-copy
        # bandwidth the HBM probe reports.
        stream = passes * mat_bytes / (RANK_STREAM_GBPS * 1e9)
        memory = max(0.0, stream - compute)
        transform = _rank_transform_cost(forest, vcols, rows)
        return CostBreakdown(compute + transform, memory, dispatch)

    if strategy == Strategy.DEPTH_BUCKETED:
        from tahoe_tpu.forest.compiler import RANK_MAX_COLS, rank_groups, reachable_depths
        from tahoe_tpu.ops.bucketed import plan_buckets

        depths = reachable_depths(forest)
        buckets = plan_buckets(depths)
        nodes = sum(
            max(len(idx), 8) * (1 << int(depths[idx].max(initial=0)))
            for idx in buckets
        )
        # mirror make_depth_bucketed_engine's chooser: rank sub-engines when
        # the rank form fits in <= 2 plane groups (one shared quantization +
        # transform), else fold sub-engines
        vcols = feasibility.rank_virtual_cols(forest)
        use_rank = vcols <= RANK_MAX_COLS and rank_groups(vcols) <= 2
        if use_rank:
            G = rank_groups(vcols)
            compute = rows * nodes * (
                cal.fold_node_ns / 1e9 * 0.15 + 128.0 * G / 206e12
            )
            compute += _rank_transform_cost(forest, vcols, rows)
            return CostBreakdown(compute, 0.0, dispatch)
        compute = rows * nodes * cal.fold_node_ns / 1e9
        if int(depths.max(initial=0)) >= 12:
            compute *= 1.3  # deep buckets run split-mode folds (see below)
        row_tile, _ = feasibility.default_tiles(Strategy.SPLIT_FOREST, forest)
        passes = max(1.0, rows / row_tile)
        # each bucket streams its own (truncated) tables
        tbytes = sum(
            len(idx) * (tree_num_nodes(int(depths[idx].max(initial=0))) * 8
                        + (1 << int(depths[idx].max(initial=0))) * 4)
            for idx in buckets
        )
        memory = passes * tbytes / (cal.hbm_gbps * 1e9)
        return CostBreakdown(compute, memory, dispatch * len(buckets))

    # fused fold kernel strategies
    row_tile, tree_tile = feasibility.default_tiles(strategy, forest)
    compute = rows * nodes_per_row * cal.fold_node_ns / 1e9
    if forest.depth >= 12:
        # deep forests force the fold kernel into subtree-split mode whose
        # narrow per-subtree folds run ~1.3x the shallow per-node cost
        # (v5e r4 sweep: 3.1-3.7 ps/node at depth 12-14 vs 2.4-2.6 shallow)
        compute *= 1.3
    passes = max(1.0, rows / row_tile)
    memory = passes * _table_bytes(forest) / (cal.hbm_gbps * 1e9)
    if strategy == Strategy.VMEM_FOREST:
        # Whole-forest residency degrades the fold once the single tile's
        # resident tables crowd VMEM. Boundary history: r7's single-slope
        # records put SPLIT 2-6% ahead at the 391 KB shapes (phishing/
        # cifar/letter) and the penalty was fitted with a 250 KB step —
        # but r8's median-of-3 re-measurements (sweep_results_r8.jsonl)
        # show VMEM winning ALL four ~390 KB families (phishing +6.2%
        # outside the noise band; cifar +0.4% / mnist +0.8% with fully
        # overlapping bands; letter +7.3%), i.e. the r7 wins there were
        # pre-median-of-3 noise. The first size where SPLIT measurably
        # wins is aloi's 784 KB (−25% r8, −0% r7); by susy's 1.57 MB the
        # pass-count mechanism dominates regardless. The ×1.12 step
        # therefore fires at 512 KB — inside the unconstrained
        # (391, 784) KB gap. Sizing comes from the shared helper so it
        # stays anchored to the fold engine's real tile layout
        # (ADVICE r4 #3).
        if feasibility.resident_table_bytes(forest) > 512 * 1024:
            compute *= 1.12
        return CostBreakdown(compute, memory, dispatch)
    # SPLIT_FOREST: same traversal; extra output-accumulation traffic per
    # tree tile beyond the first
    tiles = max(1, -(-forest.num_trees // tree_tile))
    extra = (tiles - 1) * passes * row_tile * 4 * 2 / (cal.hbm_gbps * 1e9)
    return CostBreakdown(compute, memory + extra, dispatch)


def choose_strategy(forest: ForestSpec, rows: int,
                    cal: Optional[Calibration] = None
                    ) -> Tuple[Strategy, Dict[Strategy, Optional[CostBreakdown]]]:
    """argmin over predicted costs (main.cu:66-82 analog). Returns the pick
    and the full cost table for reporting."""
    cal = cal or Calibration.default()
    costs = {s: predict_cost(s, forest, rows, cal) for s in Strategy}
    best = min(
        (s for s in Strategy if costs[s] is not None),
        key=lambda s: costs[s].total,
    )
    return best, costs
