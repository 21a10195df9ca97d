"""MXU rank kernel: exact parity with the float oracle (int8 domain)."""
import numpy as np
import pytest

from tahoe_tpu.forest import compiler, quantize, synthetic
from tahoe_tpu.ops import oracle
from tahoe_tpu.ops.rank_kernel import RankFoldEngine


def _engine(forest, **kw):
    kw.setdefault("interpret", True)
    return RankFoldEngine(forest, **kw)


@pytest.mark.parametrize("depth,trees,cols,leaf_prob", [
    (1, 5, 3, 0.0),
    (4, 17, 9, 0.2),
    (5, 70, 20, 0.15),
])
def test_matches_oracle(depth, trees, cols, leaf_prob):
    forest = synthetic.generate_forest(trees, depth, cols, leaf_prob=leaf_prob,
                                       seed=depth + 140)
    data = synthetic.generate_data(37, cols, missing_prob=0.1, seed=depth + 240)
    eng = _engine(forest, row_tile=16, tree_tile=32)
    got = np.asarray(eng.predict(data))
    want = oracle.predict(forest, data)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_threshold_ties_exact():
    forest = synthetic.generate_forest(9, 4, 6, seed=151)
    data = synthetic.generate_data(40, 6, seed=152)
    data[0, :] = forest.values[0, :6]  # exact threshold hits
    eng = _engine(forest, row_tile=8, tree_tile=16)
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_finite_missing_sentinel():
    forest = synthetic.generate_forest(11, 4, 5, missing=-999.0, leaf_prob=0.1,
                                       seed=153)
    data = synthetic.generate_data(45, 5, missing=-999.0, missing_prob=0.25,
                                   seed=154)
    eng = _engine(forest, row_tile=8, tree_tile=16)
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_hot_swapped_forest():
    """Exchange bits survive the rank-domain normalization."""
    forest = compiler.hot_child_swap(
        synthetic.generate_forest(8, 5, 10, leaf_prob=0.2, seed=155)
    )
    data = synthetic.generate_data(30, 10, missing_prob=0.15, seed=156)
    eng = _engine(forest, row_tile=8, tree_tile=8)
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_plane_encoding_round_trip():
    forest = synthetic.generate_forest(5, 3, 4, seed=157)
    data = synthetic.generate_data(25, 4, missing_prob=0.2, seed=158)
    q = quantize.quantize(forest)
    host = quantize.encode_rank_planes_np(quantize.transform_rows_np(q, data))
    import jax.numpy as jnp

    dev = np.asarray(
        quantize.encode_rank_planes_device(
            jnp.asarray(quantize.transform_rows_np(q, data))
        )
    )
    np.testing.assert_array_equal(host, dev)


def test_too_many_features_rejected():
    # 40 features now fit in 2 plane groups; the cap is RANK_MAX_COLS (120)
    forest = synthetic.generate_forest(4, 2, 130, seed=159)
    with pytest.raises(NotImplementedError):
        RankFoldEngine(forest, interpret=True)


def test_multi_group_features():
    """>30 features use G plane groups (G*128-lane matmul contraction)."""
    forest = synthetic.generate_forest(24, 6, 54, leaf_prob=0.1, seed=160)
    data = synthetic.generate_data(64, 54, missing_prob=0.1, seed=161)
    eng = RankFoldEngine(forest, row_tile=32, tree_tile=16, interpret=True)
    assert eng.groups == 2
    got = np.asarray(eng.predict(data))
    np.testing.assert_allclose(got, oracle.predict(forest, data), atol=1e-5)
