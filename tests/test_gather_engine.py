"""Gather-descent engine vs CPU oracle — exact parity expected (identical f32 math)."""
import numpy as np
import pytest

from tahoe_tpu.config import Output
from tahoe_tpu.forest import synthetic
from tahoe_tpu.ops import oracle
from tahoe_tpu.ops.gather_engine import GatherEngine


@pytest.mark.parametrize("depth,trees,cols,leaf_prob", [
    (0, 3, 2, 0.0),
    (1, 4, 3, 0.0),
    (4, 17, 9, 0.2),
    (6, 40, 30, 0.1),
])
def test_matches_oracle(depth, trees, cols, leaf_prob):
    forest = synthetic.generate_forest(trees, depth, cols, leaf_prob=leaf_prob, seed=depth)
    data = synthetic.generate_data(37, cols, missing_prob=0.1, seed=depth + 100)
    engine = GatherEngine(forest)
    got = np.asarray(engine.predict(data))
    want = oracle.predict(forest, data)
    # Per-node math is identical; only the tree-sum reduction order differs
    # between XLA and numpy, so parity is to the reference tolerance
    # (cuda_base.h:103) with lots of headroom.
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_output_transforms():
    forest = synthetic.generate_forest(
        9, 3, 6, output=int(Output.AVG | Output.SIGMOID), global_bias=0.1, seed=2,
    )
    data = synthetic.generate_data(25, 6, seed=3)
    engine = GatherEngine(forest)
    got = np.asarray(engine.predict(data))
    want = oracle.predict(forest, data)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_finite_missing():
    forest = synthetic.generate_forest(11, 4, 5, missing=-999.0, seed=4)
    data = synthetic.generate_data(30, 5, missing=-999.0, missing_prob=0.25, seed=5)
    engine = GatherEngine(forest)
    np.testing.assert_allclose(
        np.asarray(engine.predict(data)), oracle.predict(forest, data), atol=1e-5
    )
