"""Scaling-efficiency predictions (perf_model/scaling.py).

BASELINE config 5: >=85% throughput scaling efficiency to >=2 hosts.
The functional counterpart (real 2-process psum) runs in
scripts/run_multiproc.py; these tests pin the analytical bound.
"""
import pytest

from tahoe_tpu.forest import synthetic
from tahoe_tpu.perf_model.scaling import predict_scaling


@pytest.fixture(scope="module")
def susy():
    return synthetic.susy_class_forest(seed=0)


def test_two_host_config5_efficiency(susy):
    # 2 hosts x 4 chips, batch over hosts+chips, trees over 2 chips: the
    # BASELINE config-5 shape. Must clear 85%.
    p = predict_scaling(susy, 16384, n_data=4, n_model=2, cross_host=True)
    assert p.efficiency >= 0.85, p.explain()
    assert p.psum_bytes == 4 * 16384


def test_data_axis_is_free(susy):
    # pure batch sharding: no psum, efficiency limited only by dispatch skew
    p = predict_scaling(susy, 16384, n_data=8)
    assert p.psum_bytes == 0 and p.psum_s == 0.0
    assert p.efficiency >= 0.95, p.explain()


def test_psum_cost_monotone_in_bandwidth(susy):
    fast = predict_scaling(susy, 16384, n_data=1, n_model=4, ici_gbps=100.0)
    slow = predict_scaling(susy, 16384, n_data=1, n_model=4, ici_gbps=10.0)
    assert slow.psum_s > fast.psum_s
    assert slow.efficiency <= fast.efficiency


def test_dcn_slower_than_ici(susy):
    ici = predict_scaling(susy, 16384, n_data=4, n_model=2)
    dcn = predict_scaling(susy, 16384, n_data=4, n_model=2, cross_host=True)
    assert dcn.psum_s > ici.psum_s
    assert dcn.efficiency <= ici.efficiency


def test_single_device_is_unit():
    f = synthetic.generate_forest(64, 6, 12, seed=2)
    p = predict_scaling(f, 4096)
    assert p.efficiency == 1.0 and p.psum_s == 0.0 and p.dispatch_s == 0.0
