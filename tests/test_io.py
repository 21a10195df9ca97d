"""Round-trip tests for the reference text formats and the npz cache."""
import numpy as np

from tahoe_tpu.forest import io, synthetic
from tahoe_tpu.ops import oracle


def test_model_text_round_trip(tmp_path, small_forest):
    path = tmp_path / "model.txt"
    io.save_model(str(path), small_forest)
    loaded = io.load_model(str(path), num_cols=small_forest.num_cols)
    assert loaded.num_trees == small_forest.num_trees
    assert loaded.depth == small_forest.depth
    np.testing.assert_array_equal(loaded.fids, small_forest.fids)
    np.testing.assert_allclose(loaded.values, small_forest.values, rtol=1e-6)
    np.testing.assert_array_equal(loaded.def_left, small_forest.def_left)
    np.testing.assert_array_equal(loaded.is_leaf, small_forest.is_leaf)


def test_data_text_round_trip(tmp_path):
    data = synthetic.generate_data(20, 7, seed=1)
    path = tmp_path / "data.txt"
    io.save_data(str(path), data, missing=-1.0)
    loaded, missing = io.load_data(str(path))
    assert missing == -1.0
    np.testing.assert_allclose(loaded, data, rtol=1e-6)


def test_header_depth_convention(tmp_path, small_forest):
    """Model line 2 stores depth+1 (reference stores atoi-1, BaseTahoeTest.h:282)."""
    path = tmp_path / "model.txt"
    io.save_model(str(path), small_forest)
    with open(path) as f:
        assert int(f.readline()) == small_forest.num_trees
        assert int(f.readline()) == small_forest.depth + 1


def test_npz_round_trip(tmp_path, small_forest, small_data):
    path = tmp_path / "forest.npz"
    io.save_forest_npz(str(path), small_forest)
    loaded = io.load_forest_npz(str(path))
    np.testing.assert_array_equal(
        oracle.predict(loaded, small_data), oracle.predict(small_forest, small_data)
    )
