"""Forest facade + strategy enumeration + perf model plumbing."""
import numpy as np
import pytest

from tahoe_tpu.config import Strategy
from tahoe_tpu.engine import autotune, feasibility
from tahoe_tpu.engine.forest import Forest
from tahoe_tpu.forest import io, synthetic
from tahoe_tpu.perf_model import calibrate, model


@pytest.fixture(scope="module")
def forest():
    spec = synthetic.generate_forest(20, 4, 10, leaf_prob=0.15, seed=91)
    return Forest(spec)


@pytest.fixture(scope="module")
def data():
    return synthetic.generate_data(40, 10, missing_prob=0.1, seed=92)


@pytest.mark.parametrize("strategy", list(Strategy))
def test_all_strategies_match_oracle(forest, data, strategy):
    reason = forest.feasible(strategy)
    if reason is not None:
        pytest.skip(reason)
    preds = np.asarray(forest.predict(data, strategy))
    want = forest.predict_oracle(data)
    np.testing.assert_allclose(preds, want, atol=1e-5)


def test_from_files_round_trip(tmp_path, data):
    spec = synthetic.generate_forest(6, 3, 10, seed=93)
    mp = str(tmp_path / "m.txt")
    dp = str(tmp_path / "d.txt")
    io.save_model(mp, spec)
    io.save_data(dp, data, missing=float("nan"))
    f = Forest.from_files(mp, dp)
    assert f.spec.num_trees == 6
    assert f.spec.num_cols == 10
    np.testing.assert_allclose(
        np.asarray(f.predict(data, Strategy.HBM_DIRECT)),
        f.predict_oracle(data), atol=1e-5,
    )


def test_feasibility_deep_forest():
    deep = synthetic.generate_forest(2, 16, 5, seed=94)
    assert feasibility.check(Strategy.TENSOR, deep) is not None
    assert feasibility.check(Strategy.HBM_DIRECT, deep) is None


def test_perf_model_costs():
    spec = synthetic.generate_forest(50, 6, 12, seed=95)
    cal = calibrate.Calibration.default()
    best, costs = model.choose_strategy(spec, 10000, cal)
    assert best in Strategy
    for s, c in costs.items():
        if c is not None:
            assert c.total > 0


def test_enumeration_in_process(forest, data):
    spec = forest.spec
    results = autotune.enumerate_strategies(
        spec, data,
        strategies=(Strategy.HBM_DIRECT, Strategy.ROW_TILED, Strategy.SPLIT_FOREST),
        subprocess_isolation=False, warmup=1, epochs=2, verbose=False,
    )
    for s, r in results.items():
        assert r.ran, f"{s}: {r.error or r.skipped_reason}"
        assert r.correct
    assert autotune.best_strategy(results) is not None


def test_enumeration_subprocess(forest, data):
    """One strategy through the real subprocess path (CPU backend)."""
    results = autotune.enumerate_strategies(
        forest.spec, data,
        strategies=(Strategy.HBM_DIRECT,),
        subprocess_isolation=True, warmup=1, epochs=2, verbose=False,
    )
    r = results[Strategy.HBM_DIRECT]
    assert r.ran and r.correct, (r.error, r.skipped_reason)


def test_enumeration_tile_tuning(forest, data):
    """--tune-tiles path: candidate tile shapes are measured and the result
    records which (row_tile, tree_tile) won."""
    results = autotune.enumerate_strategies(
        forest.spec, data,
        strategies=(Strategy.SPLIT_FOREST,),
        subprocess_isolation=False, warmup=1, epochs=2, verbose=False,
        tune_tiles=True,
    )
    r = results[Strategy.SPLIT_FOREST]
    assert r.ran and r.correct, (r.error, r.skipped_reason)
    cands = autotune.tile_candidates(Strategy.SPLIT_FOREST, forest.spec)
    assert r.tiles in cands


def test_rank_defaults_prefer_big_row_tiles():
    """Under production limits the SUSY-class rank engine must come up at
    (1024, 128) with subtree-split mode (auto ls4) — the measured-best r2
    configuration (scripts/ls_sweep2-4.py): big row tiles amortize MXU
    weight loads; the split form keeps fold chains vreg-resident."""
    from tahoe_tpu.engine.feasibility import rank_default_tiles
    from tahoe_tpu.forest import synthetic
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    spec = synthetic.generate_forest(500, 8, 18, seed=1)
    rt, tt = rank_default_tiles(spec)
    assert (rt, tt) == (1024, 128)
    eng = RankFoldEngine(spec, row_tile=rt, tree_tile=tt, interpret=True)
    assert eng.split_level in (3, 4)


def test_rank_defaults_per_depth_deep():
    """Depth >= 13 uses the measured per-depth preference lists (r4_deep{,2,3}
    sweeps, VERDICT r3 #2): deep13 -> (128, 8) whole-level ls0 (1.15
    us/sample vs 2.17 at the old big-rt-first pick), deep14 -> (512, 4) ls8
    (2.18-2.19 us/sample, unlocked by the Db-conditioned split budget —
    scripts/derate_probe.py r4), deep15 -> (1024, 1) ls9 (2.13-2.22). The
    auto split-level chooser must land on the measured split level for
    each."""
    from tahoe_tpu.engine.feasibility import rank_default_tiles
    from tahoe_tpu.forest import synthetic
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    cases = {
        13: ((80, 13, 24), (128, 8), 0),
        14: ((60, 14, 20), (512, 4), 8),
        15: ((30, 15, 16), (1024, 1), 9),
    }
    for depth, ((T, D, C), want_tiles, want_ls) in cases.items():
        spec = synthetic.generate_forest(T, D, C, seed=1)
        rt, tt = rank_default_tiles(spec)
        assert (rt, tt) == want_tiles, (depth, rt, tt)
        eng = RankFoldEngine(spec, row_tile=rt, tree_tile=tt, interpret=True)
        assert eng.split_level == want_ls, (depth, eng.split_level)
