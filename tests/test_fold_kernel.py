"""Fused Pallas select-fold kernel vs oracle (interpret mode on CPU)."""
import numpy as np
import pytest

from tahoe_tpu.config import Output
from tahoe_tpu.forest import compiler, synthetic
from tahoe_tpu.ops import oracle
from tahoe_tpu.ops.fold_kernel import FoldKernelEngine


def _engine(forest, **kw):
    lev = compiler.levelize(compiler.hot_child_swap(forest))
    kw.setdefault("interpret", True)
    return FoldKernelEngine(lev, **kw)


@pytest.mark.parametrize("depth,trees,cols,leaf_prob", [
    (0, 3, 2, 0.0),
    (1, 5, 3, 0.0),
    (4, 17, 9, 0.2),
    (5, 70, 30, 0.15),   # trees > tree_tile: exercises tile accumulation
])
def test_matches_oracle(depth, trees, cols, leaf_prob):
    forest = synthetic.generate_forest(trees, depth, cols, leaf_prob=leaf_prob,
                                       seed=depth + 70)
    data = synthetic.generate_data(37, cols, missing_prob=0.1, seed=depth + 170)
    eng = _engine(forest, row_tile=16, tree_tile=32)
    got = np.asarray(eng.predict(data))
    want = oracle.predict(forest, data)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_finite_missing_sentinel():
    forest = synthetic.generate_forest(11, 4, 5, missing=-999.0, leaf_prob=0.1,
                                       seed=81)
    data = synthetic.generate_data(45, 5, missing=-999.0, missing_prob=0.25,
                                   seed=82)
    eng = _engine(forest, row_tile=8, tree_tile=16)
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_no_hot_swap_variant():
    """Kernel must also run forests without the swap pass (invert all-zero)."""
    forest = synthetic.generate_forest(9, 4, 7, leaf_prob=0.1, seed=83)
    data = synthetic.generate_data(29, 7, missing_prob=0.1, seed=84)
    lev = compiler.levelize(forest)
    eng = FoldKernelEngine(lev, row_tile=8, tree_tile=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_output_transform():
    forest = synthetic.generate_forest(
        9, 3, 6, output=int(Output.AVG | Output.SIGMOID), global_bias=0.5, seed=85
    )
    data = synthetic.generate_data(19, 6, seed=86)
    eng = _engine(forest, row_tile=8, tree_tile=16)
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-6
    )


def test_feasibility_check():
    # 70 features → no ge mode → no subtree blocking → the whole-level w
    # buffer at this tile size must bust the VMEM budget
    forest = synthetic.generate_forest(8, 10, 70, seed=87)
    lev = compiler.levelize(forest)
    with pytest.raises(ValueError, match="VMEM"):
        FoldKernelEngine(lev, row_tile=4096, tree_tile=1024)


def test_too_many_features_rejected():
    # a 200-col forest with only a dozen live fids now auto-compacts and
    # WORKS (tests/test_compact.py); rejection needs > 512 LIVE features
    forest = synthetic.generate_forest(300, 4, 2000, seed=88)
    lev = compiler.levelize(forest)
    assert len(__import__("numpy").unique(forest.fids[~forest.is_leaf])) > 512
    with pytest.raises(NotImplementedError):
        FoldKernelEngine(lev, interpret=True)


def test_depth_nine():
    """covtype-class depth; exercises multi-chunk levels beyond 2^8."""
    forest = synthetic.generate_forest(12, 9, 16, leaf_prob=0.1, seed=99)
    data = synthetic.generate_data(21, 16, missing_prob=0.1, seed=199)
    eng = _engine(forest, row_tile=8, tree_tile=8)
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


@pytest.mark.parametrize("split_level", [None, 4, 5])
def test_deep_forest_subtree_split(split_level):
    """Depth-10 forest through the subtree-blocked fold (deep-forest path):
    levels below the split fold one bottom subtree at a time over
    subtree-major tables; parity must be exact for every split choice."""
    forest = synthetic.generate_forest(12, 10, 12, leaf_prob=0.1, seed=91)
    data = synthetic.generate_data(33, 12, missing_prob=0.1, seed=92)
    lev = compiler.levelize(forest)
    eng = FoldKernelEngine(lev, row_tile=8, tree_tile=16, interpret=True,
                           split_level=split_level)
    if split_level is not None:
        assert eng.split_level == split_level
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_split_level_validation():
    forest = synthetic.generate_forest(8, 6, 10, seed=93)
    lev = compiler.levelize(forest)
    # root span 16*2^2 = 64 < 128 lanes → invalid
    with pytest.raises(ValueError, match="split_level"):
        FoldKernelEngine(lev, row_tile=8, tree_tile=16, interpret=True,
                         split_level=2)


def test_deep_forest_facade_dispatch():
    """Depth-12 forests must stay on the fused fold path via the facade
    (the deep-forest fallback-to-gather gap closed by subtree blocking)."""
    from tahoe_tpu.config import Strategy
    from tahoe_tpu.engine.forest import Forest

    forest = synthetic.generate_forest(12, 12, 10, leaf_prob=0.05, seed=94)
    f = Forest(forest)
    assert f.feasible(Strategy.SPLIT_FOREST) is None
    data = synthetic.generate_data(24, 10, missing_prob=0.05, seed=95)
    got = np.asarray(f.predict(data, Strategy.SPLIT_FOREST))
    np.testing.assert_allclose(got, f.predict_oracle(data), atol=1e-5)
