"""ge-normalization: single-compare fold must replay the oracle exactly."""
import numpy as np
import pytest

from tahoe_tpu.forest import compiler, synthetic
from tahoe_tpu.ops import oracle


def _ge_fold_numpy(forest, data, swap=True):
    """Numpy replay of the single-compare fold: one >= per node, no
    def_right/invert/missing logic at all."""
    lev = compiler.levelize(compiler.hot_child_swap(forest) if swap else forest)
    fid_l, thr_l, leaf = compiler.ge_normalize(lev)
    F = lev.num_cols

    x = np.asarray(data, np.float32)
    miss = oracle.missing_mask_np(x, lev.missing)
    xc = np.where(miss, np.float32(np.nan), x)
    x_ext = np.concatenate([xc, -xc], axis=1)  # [R, 2F]

    w = None
    with np.errstate(invalid="ignore"):
        for d in range(lev.depth - 1, -1, -1):
            fid = fid_l[d]
            xv = x_ext[:, fid.reshape(-1)].reshape(x.shape[0], lev.num_trees, 1 << d)
            cond = xv >= thr_l[d][None]
            half = 1 << d
            if w is None:
                lv = np.broadcast_to(leaf[None], (x.shape[0],) + leaf.shape)
                w = np.where(cond, lv[:, :, half:], lv[:, :, :half])
            else:
                w = np.where(cond, w[..., half:], w[..., :half])
    return np.ascontiguousarray(w[..., 0])


@pytest.mark.parametrize("missing,missing_prob,leaf_prob", [
    (float("nan"), 0.15, 0.2),
    (-999.0, 0.25, 0.1),
    (float("nan"), 0.0, 0.0),
])
def test_exact_margin_parity(missing, missing_prob, leaf_prob):
    forest = synthetic.generate_forest(
        13, 5, 9, leaf_prob=leaf_prob, missing=missing, seed=121
    )
    data = synthetic.generate_data(
        120, 9, missing=missing, missing_prob=missing_prob, seed=122
    )
    # threshold-equal values exercise the >= tie edge; ±0 the signed-zero edge
    data[0, :] = forest.values[0, :9]
    data[1, 0], data[1, 1] = 0.0, -0.0
    got = _ge_fold_numpy(forest, data)
    want = _reference_leaves(forest, data)
    np.testing.assert_array_equal(got, want)  # exact per-(row,tree) leaves
    np.testing.assert_allclose(
        got.sum(axis=1, dtype=np.float32),
        oracle.predict_margins(forest, data), atol=1e-5,
    )


def _reference_leaves(forest, data):
    """Per-(row,tree) selected leaf values via masked descent (exact)."""
    x = np.asarray(data, np.float32)
    R, T = x.shape[0], forest.num_trees
    curr = np.zeros((R, T), dtype=np.int64)
    tix = np.arange(T)[None, :]
    for _ in range(forest.depth):
        node_leaf = forest.is_leaf[tix, curr]
        thr = forest.values[tix, curr]
        fd = forest.fids[tix, curr]
        dl = forest.def_left[tix, curr]
        ex = forest.exchange[tix, curr]
        xv = np.take_along_axis(x, fd, axis=1)
        m = oracle.missing_mask_np(xv, forest.missing)
        cond = np.where(m, ~dl, xv >= thr)
        cond = np.where(ex, ~cond, cond)
        curr = np.where(node_leaf, curr, 2 * curr + 1 + cond)
    return forest.values[tix, curr]


def test_without_hot_swap():
    forest = synthetic.generate_forest(9, 4, 6, leaf_prob=0.15, seed=123)
    data = synthetic.generate_data(80, 6, missing_prob=0.2, seed=124)
    got = _ge_fold_numpy(forest, data, swap=False)
    np.testing.assert_array_equal(got, _reference_leaves(forest, data))
