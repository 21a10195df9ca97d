"""Fused Pallas rank transforms vs the numpy reference (interpret mode).

The v2 bucketed kernel (ops/rank_transform.py) must reproduce
``encode_rank_planes_np(transform_rows_np(...))`` bit-exactly: ranks drive
routing decisions, so a single off-by-one at a threshold tie breaks oracle
parity (reference compare semantics: Struct.h:383).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tahoe_tpu.forest import quantize, synthetic
from tahoe_tpu.ops.rank_transform import (
    LANE,
    build_bucket_tables,
    pad_threshold_tables,
    rank_planes_kernel,
    rank_planes_kernel_v2,
)


def _canon(data, F):
    x = np.asarray(data, np.float32)
    x = np.pad(x, ((0, 0), (0, LANE - x.shape[1])))
    miss = np.isnan(np.asarray(data, np.float32))
    x[:, :F][miss] = np.nan
    return x


def _want(q, data):
    return quantize.encode_rank_planes_np(quantize.transform_rows_np(q, data))


def _edge_rows(data, q):
    data = data.copy()
    data[0, 0] = q.tables[0][0]        # exact threshold tie
    data[1, 1] = -0.0                  # signed-zero vs +0.0 thresholds
    data[2, 2] = np.inf
    data[3, 3] = -np.inf
    return data


@pytest.mark.parametrize("cols", [17, 18])  # odd F exercises the dummy half
def test_v2_paired_matches_numpy(cols):
    forest = synthetic.generate_forest(40, 8, cols, seed=0)
    q = quantize.quantize(forest)
    data = _edge_rows(
        synthetic.generate_data(256, cols, missing_prob=0.05, seed=1), q
    )
    cmax, digs, S, paired = build_bucket_tables(q.tables, cols)
    assert paired  # small tables → two features per digit slot
    got = rank_planes_kernel_v2(
        jnp.asarray(_canon(data, cols)), cmax, digs, S, paired,
        row_tile=256, interpret=True,
    )
    assert np.array_equal(np.asarray(got), _want(q, data))


def test_v2_unpaired_matches_numpy():
    # few features → >64 chunks per feature → unpaired slot layout
    forest = synthetic.generate_forest(500, 8, 6, seed=0)
    q = quantize.quantize(forest)
    data = _edge_rows(
        synthetic.generate_data(256, 6, missing_prob=0.05, seed=1), q
    )
    cmax, digs, S, paired = build_bucket_tables(q.tables, 6)
    assert not paired and S > 64
    got = rank_planes_kernel_v2(
        jnp.asarray(_canon(data, 6)), cmax, digs, S, paired,
        row_tile=256, interpret=True,
    )
    assert np.array_equal(np.asarray(got), _want(q, data))


@pytest.mark.parametrize("cols,big", [(40, False), (54, False), (40, True)])
def test_v2_group_streamed_matches_numpy(cols, big):
    """Multi-group forests stream one plane group's tables per grid step;
    output blocks must tile the group-major plane layout exactly. ``big``
    exercises the unpaired (S > 64) slot layout through group mode."""
    rng = np.random.default_rng(7)
    lo, hi = (9000, 16200) if big else (260, 900)
    tables = [np.unique(rng.uniform(-1, 1, int(rng.integers(lo, hi)))
                        .astype(np.float32)) for _ in range(cols)]
    rows = 32
    data = rng.uniform(-1.2, 1.2, (rows, cols)).astype(np.float32)
    data[rng.random((rows, cols)) < 0.1] = np.nan
    data[0, 0] = tables[0][0]  # exact threshold tie

    ranks = np.empty_like(data)
    for f in range(cols):
        ranks[:, f] = np.searchsorted(tables[f], data[:, f], side="right")
    ranks[np.isnan(data)] = np.nan
    want = quantize.encode_rank_planes_np(ranks)

    cmax, digs, S, paired = build_bucket_tables(tables, cols)
    assert paired != big
    got = rank_planes_kernel_v2(
        jnp.asarray(_canon(data, cols)), cmax, digs, S, paired,
        row_tile=16, interpret=True,
    )
    assert np.array_equal(np.asarray(got), want)


def test_wide_forced_v2_matches_numpy():
    """> 128 features (r5 wide extension): small threshold tables that the
    v1 flat kernel would normally take are forced through the group-streamed
    v2 grid; canonicalized rows widen to _x_lanes(F) vregs."""
    from tahoe_tpu.ops.rank_kernel import _x_lanes

    cols = 200
    rng = np.random.default_rng(11)
    tables = [np.unique(rng.uniform(-1, 1, int(rng.integers(3, 40)))
                        .astype(np.float32)) for _ in range(cols)]
    rows = 32
    data = rng.uniform(-1.2, 1.2, (rows, cols)).astype(np.float32)
    data[rng.random((rows, cols)) < 0.1] = np.nan
    data[0, 0] = tables[0][0]  # exact threshold tie

    ranks = np.empty_like(data)
    for f in range(cols):
        ranks[:, f] = np.searchsorted(tables[f], data[:, f], side="right")
    ranks[np.isnan(data)] = np.nan
    want = quantize.encode_rank_planes_np(ranks)

    x = np.pad(data, ((0, 0), (0, _x_lanes(cols) - cols)))
    cmax, digs, S, paired = build_bucket_tables(tables, cols)
    got = rank_planes_kernel_v2(
        jnp.asarray(x), cmax, digs, S, paired, row_tile=16, interpret=True,
    )
    assert np.array_equal(np.asarray(got), want)


def test_v1_rejects_wide():
    u = jnp.zeros((200, 128), jnp.float32)
    with pytest.raises(ValueError):
        rank_planes_kernel(jnp.zeros((16, 256), jnp.float32), u, row_tile=16)


def test_v1_flat_sweep_matches_numpy():
    forest = synthetic.generate_forest(10, 6, 12, seed=2)
    q = quantize.quantize(forest)
    data = _edge_rows(
        synthetic.generate_data(256, 12, missing_prob=0.1, seed=3), q
    )
    u = jnp.asarray(pad_threshold_tables(q.tables, 12))
    got = rank_planes_kernel(
        jnp.asarray(_canon(data, 12)), u, row_tile=256, interpret=True
    )
    assert np.array_equal(np.asarray(got), _want(q, data))
