"""Rank quantization: predictions must be EXACTLY equal to the float engine."""
import numpy as np
import pytest

from tahoe_tpu.forest import compiler, quantize, synthetic
from tahoe_tpu.ops import oracle
from tahoe_tpu.ops.fold_kernel import FoldKernelEngine


@pytest.mark.parametrize("missing,missing_prob", [
    (float("nan"), 0.15),
    (-999.0, 0.2),
])
def test_oracle_exact_parity(missing, missing_prob):
    forest = synthetic.generate_forest(
        15, 5, 8, leaf_prob=0.15, missing=missing, seed=111
    )
    data = synthetic.generate_data(
        200, 8, missing=missing, missing_prob=missing_prob, seed=112
    )
    # duplicate some feature values onto thresholds to exercise tie-breaking
    data[0, :] = forest.values[0, :8]

    q = quantize.quantize(forest)
    qdata = quantize.transform_rows_np(q, data)
    qspec = quantize.quantized_spec_for_engines(q)

    want = oracle.predict(forest, data)
    got = oracle.predict(qspec, qdata)
    np.testing.assert_array_equal(got, want)  # EXACT, not allclose


def test_device_transform_matches_host():
    forest = synthetic.generate_forest(10, 4, 6, seed=113)
    data = synthetic.generate_data(64, 6, missing_prob=0.1, seed=114)
    q = quantize.quantize(forest)
    host = quantize.transform_rows_np(q, data)
    dev = np.asarray(quantize.transform_rows_device(q, data))
    np.testing.assert_array_equal(np.isnan(host), np.isnan(dev))
    m = ~np.isnan(host)
    np.testing.assert_array_equal(host[m], dev[m])


def test_fold_kernel_on_ranks():
    forest = synthetic.generate_forest(20, 4, 9, leaf_prob=0.1, seed=115)
    data = synthetic.generate_data(50, 9, missing_prob=0.1, seed=116)
    q = quantize.quantize(forest)
    qspec = quantize.quantized_spec_for_engines(q)
    qdata = quantize.transform_rows_np(q, data)
    eng = FoldKernelEngine(
        compiler.levelize(qspec), row_tile=8, tree_tile=16, interpret=True
    )
    got = np.asarray(eng.predict(qdata))
    want = oracle.predict(forest, data)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_width_selection():
    few = synthetic.generate_forest(3, 3, 4, seed=117)
    assert quantize.quantize(few).width == 1
    many = synthetic.generate_forest(300, 6, 2, seed=118)  # >254 thresholds/feat
    assert quantize.quantize(many).width == 2
