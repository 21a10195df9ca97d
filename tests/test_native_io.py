"""Native C++ loader vs Python loader: identical parses of both text formats."""
import numpy as np
import pytest

from tahoe_tpu.forest import io, native_io, synthetic


needs_native = pytest.mark.skipif(
    not native_io.available(), reason="libtahoe_io.so not built"
)


@needs_native
def test_model_parse_matches_python(tmp_path, small_forest):
    path = str(tmp_path / "model.txt")
    io.save_model(path, small_forest)
    nt, depth, table = native_io.load_model(path)
    assert nt == small_forest.num_trees and depth == small_forest.depth
    np.testing.assert_array_equal(
        table[:, 0].astype(np.int32), small_forest.fids.reshape(-1)
    )
    np.testing.assert_allclose(
        table[:, 1].astype(np.float32), small_forest.values.reshape(-1), rtol=1e-6
    )
    np.testing.assert_array_equal(
        table[:, 4].astype(bool), small_forest.is_leaf.reshape(-1)
    )


@needs_native
def test_data_parse_matches_python(tmp_path):
    data = synthetic.generate_data(50, 9, seed=2)
    path = str(tmp_path / "data.txt")
    io.save_data(path, data, missing=-7.5)
    rows, missing = native_io.load_data(path)
    assert missing == -7.5
    np.testing.assert_allclose(rows, data, rtol=1e-6)


@needs_native
def test_truncated_model_raises(tmp_path):
    path = str(tmp_path / "bad.txt")
    with open(path, "w") as f:
        f.write("10\n9\n1\n2.5\n")  # header promises far more nodes
    with pytest.raises(IOError):
        native_io.load_model(path)


@needs_native
def test_loaders_use_native_path(tmp_path, small_forest, small_data):
    """io.load_model must route through the native parser and agree with the
    pure-Python parse bit for bit."""
    path = str(tmp_path / "model.txt")
    io.save_model(path, small_forest)
    via_io = io.load_model(path, num_cols=small_forest.num_cols)
    np.testing.assert_array_equal(via_io.values, small_forest.values)
    np.testing.assert_array_equal(via_io.fids, small_forest.fids)
