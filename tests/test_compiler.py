"""Compiler passes must be semantics-preserving (oracle parity) and
structurally correct."""
import numpy as np
import pytest

from tahoe_tpu.config import NodeWidth
from tahoe_tpu.forest import compiler, synthetic
from tahoe_tpu.forest.simhash import tree_simhashes
from tahoe_tpu.ops import oracle


@pytest.fixture(scope="module")
def forest():
    return synthetic.generate_forest(13, 5, 20, leaf_prob=0.15, seed=21)


@pytest.fixture(scope="module")
def data():
    return synthetic.generate_data(57, 20, missing_prob=0.12, seed=22)


def test_hot_child_swap_preserves_predictions(forest, data):
    swapped = compiler.hot_child_swap(forest)
    np.testing.assert_array_equal(
        oracle.predict(swapped, data), oracle.predict(forest, data)
    )
    assert swapped.exchange.any(), "some swaps should have fired"


def test_hot_child_swap_weight_invariant(forest):
    """After the pass, no non-leaf node has left child heavier... lighter than
    right: right child weight >= left child weight wherever a swap applied."""
    swapped = compiler.hot_child_swap(forest)
    for d in range(forest.depth):
        lev = swapped.level_slice(d)
        child = swapped.level_slice(d + 1)
        cw = swapped.weights[:, child].reshape(swapped.num_trees, 1 << d, 2)
        internal = ~swapped.is_leaf[:, lev]
        assert (cw[:, :, 0] >= cw[:, :, 1])[internal].all()


def test_width_selection():
    assert NodeWidth.for_max_fid(31) == NodeWidth.CHAR
    assert NodeWidth.for_max_fid(32) == NodeWidth.SHORT
    assert NodeWidth.for_max_fid(8191) == NodeWidth.SHORT
    assert NodeWidth.for_max_fid(8192) == NodeWidth.INT


def test_pack_unpack_round_trip(forest, data):
    swapped = compiler.hot_child_swap(forest)
    packed = compiler.pack(swapped)
    assert packed.width_bytes == 1  # 20 features fits CHAR
    restored = compiler.unpack(packed)
    np.testing.assert_array_equal(
        oracle.predict(restored, data), oracle.predict(swapped, data)
    )
    # node-major layout is the exact transpose
    np.testing.assert_array_equal(packed.values_reorg, packed.values.T)
    np.testing.assert_array_equal(packed.bits_reorg, packed.bits.T)


def test_cluster_preserves_predictions(forest, data):
    clustered, order = compiler.cluster_trees(forest)
    np.testing.assert_allclose(
        oracle.predict(clustered, data), oracle.predict(forest, data), atol=1e-5
    )
    assert sorted(order.tolist()) == list(range(forest.num_trees))


def test_simhash_clusters_similar_trees():
    """Identical trees must hash identically; a structurally different tree
    must (overwhelmingly) hash differently."""
    f = synthetic.generate_forest(4, 3, 6, seed=33)
    # make trees 0 and 2 identical
    for name in ("values", "weights", "fids", "def_left", "is_leaf"):
        getattr(f, name)[2] = getattr(f, name)[0]
    h = tree_simhashes(f)
    assert h[0] == h[2]
    assert h[0] != h[1] or h[0] != h[3]
    order = compiler.cluster_trees(f)[1]
    pos = {int(t): i for i, t in enumerate(order)}
    assert abs(pos[0] - pos[2]) == 1, "identical trees should be adjacent"


def test_bit_reverse_permutation():
    np.testing.assert_array_equal(compiler.bit_reverse_permutation(0), [0])
    np.testing.assert_array_equal(compiler.bit_reverse_permutation(1), [0, 1])
    np.testing.assert_array_equal(compiler.bit_reverse_permutation(2), [0, 2, 1, 3])
    np.testing.assert_array_equal(
        compiler.bit_reverse_permutation(3), [0, 4, 2, 6, 1, 5, 3, 7]
    )


def test_levelize_reference_fold(forest, data):
    """Numpy replay of the select-fold over the leveled form must equal the
    oracle on the original forest — proves push-down + exchange folding +
    bit-reversal are jointly semantics-preserving."""
    swapped = compiler.hot_child_swap(forest)
    lev = compiler.levelize(swapped)
    x = data
    miss = oracle.missing_mask_np(x, lev.missing)

    w = None
    for d in range(lev.depth - 1, -1, -1):
        fid = lev.fid[d]
        xv = x[:, fid.reshape(-1)].reshape(x.shape[0], lev.num_trees, 1 << d)
        mv = miss[:, fid.reshape(-1)].reshape(xv.shape)
        cmp = (xv >= lev.thresh[d][None]) ^ lev.invert[d][None]
        cond = np.where(mv, lev.def_right[d][None], cmp)
        half = 1 << d
        if w is None:
            lvv = np.broadcast_to(lev.leaf_values[None], (x.shape[0],) + lev.leaf_values.shape)
            w = np.where(cond, lvv[:, :, half:], lvv[:, :, :half])
        else:
            w = np.where(cond, w[..., half:], w[..., :half])
    margins = w[..., 0].sum(axis=1, dtype=np.float32)
    want = oracle.predict_margins(forest, data)
    np.testing.assert_allclose(margins, want, atol=1e-5)


def test_full_pipeline_parity(forest, data):
    fc, lev, packed, order = compiler.compile_forest(forest)
    np.testing.assert_allclose(
        oracle.predict(fc, data), oracle.predict(forest, data), atol=1e-5
    )
    restored = compiler.unpack(packed)
    np.testing.assert_allclose(
        oracle.predict(restored, data), oracle.predict(forest, data), atol=1e-5
    )


# ----------------------------------------------------------------------
# Unreachable-depth truncation (complete-tree filler removal)
# ----------------------------------------------------------------------

def _padded_forest(depth_real=3, depth_stored=6, trees=12, cols=6, seed=9):
    """A forest whose every path ends by depth_real, stored at depth_stored
    (the reference's complete-tree materialization, BaseTahoeTest.h:282-331):
    levels >= depth_real are unreachable filler."""
    from tahoe_tpu.config import tree_num_nodes

    f = synthetic.generate_forest(trees, depth_stored, cols, leaf_prob=0.2,
                                  seed=seed)
    lev = f.level_slice(depth_real)
    f.is_leaf[:, lev.start:] = True  # everything at/below depth_real is leaf
    f.is_leaf[:, : lev.start] &= f.is_leaf[:, : lev.start]  # keep early leaves
    assert f.values.shape[1] == tree_num_nodes(depth_stored)
    return f


def test_reachable_depths_and_truncate_exact():
    f = _padded_forest()
    depths = compiler.reachable_depths(f)
    assert depths.max() == 3
    t = compiler.truncate_depth(f, 3)
    assert t.depth == 3
    data = synthetic.generate_data(200, 6, missing_prob=0.1, seed=10)
    np.testing.assert_allclose(
        oracle.predict(t, data), oracle.predict(f, data), atol=0
    )


def test_levelize_truncates_filler_levels():
    f = _padded_forest()
    lev = compiler.levelize(f)
    assert lev.depth == 3
    lev_full = compiler.levelize(f, truncate=False)
    assert lev_full.depth == 6


def test_facade_truncates_and_matches_oracle():
    from tahoe_tpu.config import Strategy
    from tahoe_tpu.engine.forest import Forest

    f = _padded_forest(depth_real=4, depth_stored=7, trees=20, cols=8, seed=11)
    data = synthetic.generate_data(64, 8, missing_prob=0.1, seed=12)
    fr = Forest(f)
    assert fr.spec.depth == 4 and fr.stored_depth == 7
    want = oracle.predict(f, data)
    for s in (Strategy.SPLIT_FOREST, Strategy.RANK_MXU):
        got = np.asarray(fr.predict(data, s))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_quantize_skips_unreachable_thresholds():
    from tahoe_tpu.forest import quantize as qz

    f = _padded_forest()
    q = qz.quantize(f)
    live = compiler.reachable_mask(f) & ~f.is_leaf
    expect = [np.unique(f.values[live & (f.fids == c)]).size
              for c in range(f.num_cols)]
    assert [len(t) for t in q.tables] == expect
