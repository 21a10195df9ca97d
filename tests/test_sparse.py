"""Sparse (CSR) forest: converter pruning, oracle parity, device engine."""
import numpy as np
import pytest

from tahoe_tpu.forest import compiler, sparse, synthetic
from tahoe_tpu.ops import oracle


@pytest.fixture(scope="module")
def dense():
    return synthetic.generate_forest(15, 6, 10, leaf_prob=0.35, seed=131)


@pytest.fixture(scope="module")
def data():
    return synthetic.generate_data(70, 10, missing_prob=0.12, seed=132)


def test_pruning(dense):
    sf = sparse.from_dense(dense)
    assert sf.num_nodes < dense.num_nodes, "early leaves must prune subtrees"
    assert sf.num_trees == dense.num_trees


def test_numpy_parity(dense, data):
    sf = sparse.from_dense(dense)
    np.testing.assert_allclose(
        sparse.predict_np(sf, data), oracle.predict(dense, data), atol=1e-6
    )


def test_device_engine_parity(dense, data):
    sf = sparse.from_dense(dense)
    eng = sparse.SparseGatherEngine(sf)
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(dense, data), atol=1e-5
    )


def test_exchange_bits_preserved(data):
    dense = synthetic.generate_forest(8, 5, 10, leaf_prob=0.2, seed=133)
    swapped = compiler.hot_child_swap(dense)
    sf = sparse.from_dense(swapped)
    np.testing.assert_allclose(
        sparse.predict_np(sf, data), oracle.predict(dense, data), atol=1e-6
    )


def test_deep_forest_path():
    """Depth-16 dense storage would be 65k slots/tree; sparse stays small with
    aggressive early leaves."""
    deep = synthetic.generate_forest(3, 14, 6, leaf_prob=0.6, seed=134)
    sf = sparse.from_dense(deep)
    assert sf.num_nodes < 3000
    data = synthetic.generate_data(20, 6, seed=135)
    np.testing.assert_allclose(
        sparse.predict_np(sf, data), oracle.predict(deep, data), atol=1e-6
    )


def test_sparse_strategy_via_facade():
    """SPARSE is a first-class Strategy (VERDICT r1 item 5): enumerable,
    feasibility-checked, engine-built through the facade."""
    from tahoe_tpu.config import Strategy
    from tahoe_tpu.engine.forest import Forest

    forest = synthetic.generate_forest(24, 6, 10, leaf_prob=0.2, seed=51)
    data = synthetic.generate_data(64, 10, missing_prob=0.1, seed=52)
    f = Forest(forest)
    assert f.feasible(Strategy.SPARSE) is None
    got = np.asarray(f.predict(data, strategy=Strategy.SPARSE))
    np.testing.assert_allclose(got, oracle.predict(forest, data), atol=1e-5)


def test_sparse_preferred_for_very_deep():
    """Depth-16 trained shape: the leveled engines stay depth-infeasible;
    the fused fold engines are compile-FEASIBLE since the r4 subtree-group
    grid (2^16 complete-tree work, so hugely wasteful on an 80%-early-leaf
    forest) — the model must still CHOOSE the pool-priced SPARSE descent."""
    from tahoe_tpu.config import Strategy
    from tahoe_tpu.engine import feasibility
    from tahoe_tpu.perf_model import model
    from tahoe_tpu.perf_model.calibrate import Calibration

    forest = synthetic.generate_mixed_depth_forest(
        16, 16, 10, min_depth=16, leaf_prob=0.3, seed=53
    )
    assert feasibility.check(Strategy.SPARSE, forest) is None
    for s in (Strategy.TENSOR, Strategy.ROW_TILED):
        assert feasibility.check(s, forest) is not None
    best, _ = model.choose_strategy(forest, 2000, Calibration.default())
    # pool-priced SPARSE or per-depth-bucketed truncation — both price the
    # forest's emptiness; the full-width dense engines must never win here
    assert best in (Strategy.SPARSE, Strategy.DEPTH_BUCKETED)
