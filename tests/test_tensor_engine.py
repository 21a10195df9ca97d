"""Tensor (select-fold) engine vs oracle, both selection modes."""
import numpy as np
import pytest

from tahoe_tpu.config import Output
from tahoe_tpu.forest import compiler, synthetic
from tahoe_tpu.ops import oracle
from tahoe_tpu.ops.tensor_engine import TensorEngine


def _roundtrip(forest, data, **kw):
    lev = compiler.levelize(compiler.hot_child_swap(forest))
    eng = TensorEngine(lev, **kw)
    return np.asarray(eng.predict(data))


@pytest.mark.parametrize("mode", ["take", "onehot"])
@pytest.mark.parametrize("depth,trees,cols,leaf_prob", [
    (0, 3, 2, 0.0),
    (1, 5, 3, 0.0),
    (4, 17, 9, 0.2),
    (6, 40, 30, 0.15),
])
def test_matches_oracle(mode, depth, trees, cols, leaf_prob):
    forest = synthetic.generate_forest(trees, depth, cols, leaf_prob=leaf_prob, seed=depth + 50)
    data = synthetic.generate_data(37, cols, missing_prob=0.1, seed=depth + 150)
    got = _roundtrip(forest, data, select_mode=mode, row_tile=16)
    want = oracle.predict(forest, data)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("mode", ["take", "onehot"])
def test_finite_missing(mode):
    forest = synthetic.generate_forest(11, 4, 5, missing=-999.0, leaf_prob=0.1, seed=61)
    data = synthetic.generate_data(45, 5, missing=-999.0, missing_prob=0.25, seed=62)
    got = _roundtrip(forest, data, select_mode=mode, row_tile=45)
    np.testing.assert_allclose(got, oracle.predict(forest, data), atol=1e-5)


def test_output_transform_and_padding():
    forest = synthetic.generate_forest(
        9, 3, 6, output=int(Output.AVG | Output.SIGMOID | Output.THRESHOLD),
        seed=63,
    )
    # 37 rows with row_tile 16 exercises padding
    data = synthetic.generate_data(37, 6, seed=64)
    got = _roundtrip(forest, data, row_tile=16)
    want = oracle.predict(forest, data)
    np.testing.assert_array_equal(got, want)


def test_exact_onehot_selection():
    """HIGHEST-precision one-hot matmul must reproduce f32 feature values
    bit-exactly (the 6-pass bf16 decomposition argument)."""
    import jax, jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 33)).astype(np.float32) * 1e3
    fid = rng.integers(0, 33, size=128)
    s = np.zeros((33, 128), dtype=np.float32)
    s[fid, np.arange(128)] = 1.0
    out = jax.lax.dot_general(
        jnp.asarray(x), jnp.asarray(s), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_array_equal(np.asarray(out), x[:, fid])
