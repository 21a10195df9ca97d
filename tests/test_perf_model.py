"""Analytical performance model: prediction pins + feasibility skips.

The reference validates its cost model by comparing the predicted strategy
with the enumerated best (main.cu:85-92); the sweep does that on hardware.
These tests pin the model's choices on shapes whose measured winners are
known from v5e runs (sweep_results_r*.jsonl), so a regression in the cost
terms shows up without a chip.
"""
import pytest

from tahoe_tpu.config import Strategy
from tahoe_tpu.forest import synthetic
from tahoe_tpu.perf_model import model
from tahoe_tpu.perf_model.calibrate import Calibration


CASES = [
    # (trees, depth, cols, rows) -> measured-best strategies on v5e (a set
    # where hardware measurements put two strategies within noise of each
    # other — covtype-class VMEM fold vs 2-group rank measured 0.30 vs 0.30)
    ((500, 8, 18, 10000), {Strategy.RANK_MXU}),    # SUSY-class
    ((160, 7, 16, 4000), {Strategy.RANK_MXU}),     # letter-class
    ((100, 12, 28, 4000), {Strategy.RANK_MXU}),    # deep12 (whole-level)
    ((80, 13, 24, 3000), {Strategy.RANK_MXU}),     # deep13 (whole-level)
    # deep15: dense fold newly feasible in r4 (subtree-group grid kernel);
    # RANK measured 4.53 in r2 when fold couldn't run — re-pin to the r4
    # sweep winner once the dense strategies are measured on chip
    ((30, 15, 16, 1000),
     {Strategy.RANK_MXU, Strategy.VMEM_FOREST, Strategy.SPLIT_FOREST}),
    ((250, 9, 54, 6000),
     {Strategy.VMEM_FOREST, Strategy.RANK_MXU}),   # covtype-class near-tie
    # r6 wide-family winners (sweep_results_r6.jsonl, all model-correct)
    ((300, 8, 30, 8000), {Strategy.RANK_MXU}),     # hock-class
    ((250, 8, 130, 5000), {Strategy.SPLIT_FOREST}),  # allstate-class
    # aloi-class: VMEM vs SPLIT are the same kernel family at different
    # tree tilings (r6 measured VMEM best under the r3 kernel; the r4
    # split-grid shifts SPLIT's default tiles — re-pin from the r7 sweep)
    ((200, 8, 128, 5000), {Strategy.VMEM_FOREST, Strategy.SPLIT_FOREST}),
    # phishing-class: r8's median-of-3 record puts VMEM 6.2% ahead —
    # OUTSIDE the 5% noise band (r7's single-slope SPLIT win there was
    # noise); its 391 KB resident tables sit below the re-fitted 512 KB
    # degradation boundary (model.py VMEM penalty, sweep_results_r8.jsonl)
    ((200, 7, 68, 6000), {Strategy.VMEM_FOREST}),
    # cifar/mnist-class: measured VMEM-vs-SPLIT ties (r8 gaps +0.4%/+0.8%,
    # bands fully overlapping) — either sibling is an acceptable pick, but
    # the 391 KB / ~291 KB residencies must NOT trip the 512 KB penalty
    # into a >5% SPLIT preference
    ((150, 7, 120, 3000), {Strategy.VMEM_FOREST, Strategy.SPLIT_FOREST}),
    ((100, 6, 400, 2000), {Strategy.VMEM_FOREST, Strategy.SPLIT_FOREST}),
]


@pytest.mark.parametrize("shape,want", CASES)
def test_predicts_measured_best(shape, want):
    t, d, c, rows = shape
    spec = synthetic.generate_forest(t, d, c, seed=1)
    best, costs = model.choose_strategy(spec, rows, Calibration.default())
    assert best in want, {s.name: (v.total if v else None)
                          for s, v in costs.items()}


def test_deep15_fold_now_feasible():
    """r4 contract flip: the subtree-group grid fold kernel compiles in
    O(2^Db) statements per grid step, so dense depth-15 strategies are
    feasible (they were compile-walled through r3); depth 23 has no unwalled
    split level for the tested tree tile and stays infeasible."""
    spec = synthetic.generate_forest(30, 15, 16, seed=1)
    cal = Calibration.default()
    assert model.predict_cost(Strategy.SPLIT_FOREST, spec, 1000, cal) is not None
    assert model.predict_cost(Strategy.VMEM_FOREST, spec, 1000, cal) is not None
    assert model.predict_cost(Strategy.RANK_MXU, spec, 1000, cal) is not None


def test_fold_compile_wall_reasons():
    from tahoe_tpu.ops.fold_kernel import FoldKernelEngine

    assert FoldKernelEngine.compile_wall(15, 0) is not None
    assert FoldKernelEngine.compile_wall(14, 0) is None
    assert FoldKernelEngine.compile_wall(15, 7) is None
    assert FoldKernelEngine.compile_wall(17, 7) is not None


def test_cost_breakdown_fields():
    spec = synthetic.generate_forest(64, 6, 12, seed=2)
    cb = model.predict_cost(Strategy.RANK_MXU, spec, 2048,
                            Calibration.default())
    assert cb.compute_s > 0 and cb.dispatch_s > 0 and cb.memory_s >= 0
    assert cb.total == cb.compute_s + cb.memory_s + cb.dispatch_s
