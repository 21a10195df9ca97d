"""Oracle self-validation: vectorized numpy oracle vs literal scalar transcription."""
import numpy as np
import pytest

from tahoe_tpu.config import Output
from tahoe_tpu.forest import synthetic
from tahoe_tpu.ops import oracle


@pytest.mark.parametrize("output,bias,thresh", [
    (int(Output.RAW), 0.0, 0.5),
    (int(Output.AVG), 0.0, 0.5),
    (int(Output.AVG | Output.SIGMOID), 0.25, 0.5),
    (int(Output.AVG | Output.SIGMOID | Output.THRESHOLD), 0.0, 0.5),
])
def test_vectorized_matches_scalar(output, bias, thresh):
    forest = synthetic.generate_forest(
        7, 4, 5, leaf_prob=0.25, output=output, global_bias=bias,
        threshold=thresh, seed=11,
    )
    data = synthetic.generate_data(33, 5, missing_prob=0.15, seed=12)
    got = oracle.predict(forest, data)
    want = oracle.predict_scalar(forest, data)
    np.testing.assert_array_equal(got, want)


def test_finite_missing_sentinel():
    missing = -999.0
    forest = synthetic.generate_forest(5, 3, 4, leaf_prob=0.1, missing=missing, seed=5)
    data = synthetic.generate_data(40, 4, missing=missing, missing_prob=0.3, seed=6)
    got = oracle.predict(forest, data)
    want = oracle.predict_scalar(forest, data)
    np.testing.assert_array_equal(got, want)
    # the sentinel actually appears and takes the default route
    assert (data == np.float32(missing)).any()


def test_exchange_bits_round_trip():
    """Flipping children + setting exchange must leave predictions unchanged."""
    forest = synthetic.generate_forest(6, 4, 5, leaf_prob=0.2, seed=7)
    data = synthetic.generate_data(50, 5, seed=8)
    base = oracle.predict(forest, data)

    # Manually swap both child subtrees of the root of every tree and set the
    # root exchange bit: semantics must be preserved.
    swapped = forest.copy()
    n = forest.nodes_per_tree
    perm = np.arange(n)
    # heap subtree swap: for every node, if its path's first step goes
    # left/right swap at depth1. Build permutation mapping node -> mirrored
    # node at the top split.
    for i in range(1, n):
        d = (i + 1).bit_length() - 1  # depth of node i
        base_ix = (1 << d) - 1
        off = i - base_ix
        half = 1 << (d - 1)
        perm[i] = base_ix + (off + half) % (1 << d)
    for arr_name in ("values", "weights", "fids", "def_left", "is_leaf", "exchange"):
        arr = getattr(swapped, arr_name)
        arr[:] = arr[:, perm]
    swapped.exchange[:, 0] = ~swapped.exchange[:, 0]

    got = oracle.predict(swapped, data)
    np.testing.assert_array_equal(got, base)


def test_depth_zero_forest():
    forest = synthetic.generate_forest(3, 0, 2, seed=9)
    data = synthetic.generate_data(10, 2, seed=10)
    preds = oracle.predict(forest, data)
    np.testing.assert_allclose(preds, forest.values[:, 0].sum() * np.ones(10), rtol=1e-6)
