"""utils: oracle-parity gate, profiling helpers."""
import numpy as np

from tahoe_tpu.forest import synthetic
from tahoe_tpu.ops.gather_engine import GatherEngine
from tahoe_tpu.utils import debug, profiling


def test_check_engine_pass():
    forest = synthetic.generate_forest(7, 4, 6, leaf_prob=0.1, seed=171)
    data = synthetic.generate_data(30, 6, seed=172)
    rep = debug.check_engine(GatherEngine(forest), forest, data)
    assert rep.correct and rep.num_bad == 0
    assert "correct" in str(rep)


def test_check_engine_detects_corruption():
    forest = synthetic.generate_forest(7, 4, 6, seed=173)
    data = synthetic.generate_data(30, 6, seed=174)
    eng = GatherEngine(forest)
    good = eng.predict  # wrap with corruption

    class Bad:
        def predict(self, d):
            return np.asarray(good(d)) + 1.0

    rep = debug.check_engine(Bad(), forest, data)
    assert not rep.correct and rep.num_bad == 30
    assert "INCORRECT" in str(rep)


def test_slope_time_monotonic():
    import time

    def run_k(k):
        time.sleep(0.002 * k)
        return np.zeros(1)

    t = profiling.slope_time(run_k, k1=1, k2=5, n=2)
    assert 0.0015 < t < 0.004


def test_predict_k_consistency():
    """predict_k(data, k) must equal predict(data) for any k (chained calls
    are value-identical; only the dependency differs)."""
    forest = synthetic.generate_forest(9, 4, 7, leaf_prob=0.1, seed=175)
    data = synthetic.generate_data(25, 7, missing_prob=0.1, seed=176)
    eng = GatherEngine(forest)
    np.testing.assert_allclose(
        np.asarray(eng.predict_k(data, 3)), np.asarray(eng.predict(data)),
        atol=1e-6,
    )
