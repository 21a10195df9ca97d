"""Analytical performance model: predict the best strategy before running.

The TPU re-derivation of the reference's closed-form model (main.cu:22-82),
which sums fast-memory and slow-memory access terms per strategy from the
forest shape and one measured bandwidth, then takes the argmin. The shape
parameters match (S_sample→num_cols, D_tree→depth, N_tree→num_trees,
N_nodes→2^(D+1)-1); the hardware terms are TPU-native: VPU op counts for the
vectorized select-fold, HBM streaming for node tables and intermediates, and
per-call dispatch. Like the reference, the model is *validated* against
exhaustive enumeration (autotune.enumerate_strategies) and the CLI reports
"predicts correctly/incorrectly" (main.cu:85-90).

All costs are per predict() call in seconds, for ``rows`` samples.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

from tahoe_tpu.config import Strategy, tree_num_nodes
from tahoe_tpu.engine import feasibility
from tahoe_tpu.forest.spec import ForestSpec
from tahoe_tpu.perf_model.calibrate import Calibration


@dataclasses.dataclass(frozen=True)
class CostBreakdown:
    compute_s: float
    memory_s: float
    dispatch_s: float

    @property
    def total(self) -> float:
        return self.compute_s + self.memory_s + self.dispatch_s


def _fold_cost(forest: ForestSpec, rows: int, cal: Calibration,
               table_passes: float) -> CostBreakdown:
    """Shared select-fold cost: per (row, tree) ≈ 2^D cond evaluations
    (gather+2 compares+select+xor ≈ 5 ops) + 2^D fold selects; node tables
    stream from HBM ``table_passes`` times per batch."""
    T, D = forest.num_trees, forest.depth
    leaves = 1 << D
    ops = rows * T * leaves * (5 + 2)
    compute = ops / (cal.vpu_gops * 1e9)
    table_bytes = T * (tree_num_nodes(D) * 16 + leaves * 4)
    memory = table_passes * table_bytes / (cal.hbm_gbps * 1e9)
    return CostBreakdown(compute, memory, cal.dispatch_us / 1e6)


def predict_cost(strategy: Strategy, forest: ForestSpec, rows: int,
                 cal: Calibration) -> Optional[CostBreakdown]:
    """Predicted cost, or None when infeasible (reference: acc=FLT_MAX skip)."""
    if feasibility.check(strategy, forest) is not None:
        return None
    T, D, F = forest.num_trees, forest.depth, forest.num_cols
    leaves = 1 << D
    nodes = tree_num_nodes(D)

    if strategy == Strategy.HBM_DIRECT:
        # level-synchronous gathers: XLA's TPU gather is the bottleneck —
        # ~1 element / few ns effective; model as ~40 VPU-op-equivalents per
        # gathered element (3 tables + data per level)
        gathers = rows * T * (D + 1) * 4
        compute = gathers * 40 / (cal.vpu_gops * 1e9)
        memory = rows * T * (D + 1) * 12 / (cal.hbm_gbps * 1e9)
        return CostBreakdown(compute, memory, cal.dispatch_us / 1e6)

    if strategy == Strategy.ROW_TILED:
        # jnp select-fold with take-mode selection; conds/w round-trip HBM
        inter = rows * T * leaves * 5 * 2  # bytes of intermediates r+w
        cb = _fold_cost(forest, rows, cal, table_passes=1.0)
        return CostBreakdown(cb.compute_s, cb.memory_s + inter / (cal.hbm_gbps * 1e9),
                             cb.dispatch_s)

    if strategy == Strategy.TENSOR:
        # one-hot MXU selection at HIGHEST precision: 6 bf16 passes over
        # K=128-padded matmuls + the same HBM intermediate traffic
        macs = rows * 128.0 * T * leaves * 2 * 6
        mxu = macs / (197e12 * 0.5)
        inter = rows * T * leaves * 6 * 2
        cb = _fold_cost(forest, rows, cal, table_passes=1.0)
        return CostBreakdown(cb.compute_s + mxu,
                             cb.memory_s + inter / (cal.hbm_gbps * 1e9),
                             cb.dispatch_s)

    if strategy == Strategy.VMEM_FOREST:
        # whole forest resident per cell: tables stream once per row tile
        row_tile, _ = feasibility.default_tiles(strategy, forest)
        passes = max(1.0, rows / row_tile)
        return _fold_cost(forest, rows, cal, table_passes=passes)

    if strategy == Strategy.SPLIT_FOREST:
        # tree chunks: each row tile revisits all chunks; tables stream once
        # per row tile as well, but smaller working set → better overlap.
        row_tile, _ = feasibility.default_tiles(strategy, forest)
        passes = max(1.0, rows / row_tile)
        cb = _fold_cost(forest, rows, cal, table_passes=passes)
        # slight VMEM-locality advantage vs pinning the whole forest
        return CostBreakdown(cb.compute_s, cb.memory_s * 0.9, cb.dispatch_s)

    raise AssertionError(strategy)


def choose_strategy(forest: ForestSpec, rows: int,
                    cal: Optional[Calibration] = None
                    ) -> tuple[Strategy, Dict[Strategy, Optional[CostBreakdown]]]:
    """argmin over predicted costs (main.cu:66-82 analog). Returns the pick
    and the full cost table for reporting."""
    cal = cal or Calibration.default()
    costs = {s: predict_cost(s, forest, rows, cal) for s in Strategy}
    best = min(
        (s for s in Strategy if costs[s] is not None),
        key=lambda s: costs[s].total,
    )
    return best, costs
