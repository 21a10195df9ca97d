"""MXU rank kernel: exact parity with the float oracle (int8 domain)."""
import numpy as np
import pytest

from tahoe_tpu.forest import compiler, quantize, synthetic
from tahoe_tpu.ops import oracle
from tahoe_tpu.ops.rank_kernel import RankFoldEngine


def _engine(forest, **kw):
    kw.setdefault("interpret", True)
    return RankFoldEngine(forest, **kw)


@pytest.mark.parametrize("depth,trees,cols,leaf_prob", [
    (1, 5, 3, 0.0),
    (4, 17, 9, 0.2),
    (5, 70, 20, 0.15),
])
def test_matches_oracle(depth, trees, cols, leaf_prob):
    forest = synthetic.generate_forest(trees, depth, cols, leaf_prob=leaf_prob,
                                       seed=depth + 140)
    data = synthetic.generate_data(37, cols, missing_prob=0.1, seed=depth + 240)
    eng = _engine(forest, row_tile=16, tree_tile=32)
    got = np.asarray(eng.predict(data))
    want = oracle.predict(forest, data)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_threshold_ties_exact():
    forest = synthetic.generate_forest(9, 4, 6, seed=151)
    data = synthetic.generate_data(40, 6, seed=152)
    data[0, :] = forest.values[0, :6]  # exact threshold hits
    eng = _engine(forest, row_tile=8, tree_tile=16)
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_finite_missing_sentinel():
    forest = synthetic.generate_forest(11, 4, 5, missing=-999.0, leaf_prob=0.1,
                                       seed=153)
    data = synthetic.generate_data(45, 5, missing=-999.0, missing_prob=0.25,
                                   seed=154)
    eng = _engine(forest, row_tile=8, tree_tile=16)
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_hot_swapped_forest():
    """Exchange bits survive the rank-domain normalization."""
    forest = compiler.hot_child_swap(
        synthetic.generate_forest(8, 5, 10, leaf_prob=0.2, seed=155)
    )
    data = synthetic.generate_data(30, 10, missing_prob=0.15, seed=156)
    eng = _engine(forest, row_tile=8, tree_tile=8)
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_plane_encoding_round_trip():
    forest = synthetic.generate_forest(5, 3, 4, seed=157)
    data = synthetic.generate_data(25, 4, missing_prob=0.2, seed=158)
    q = quantize.quantize(forest)
    host = quantize.encode_rank_planes_np(quantize.transform_rows_np(q, data))
    import jax.numpy as jnp

    dev = np.asarray(
        quantize.encode_rank_planes_device(
            jnp.asarray(quantize.transform_rows_np(q, data))
        )
    )
    np.testing.assert_array_equal(host, dev)


def test_too_many_features_rejected():
    # the cap is RANK_MAX_COLS (480) LIVE features — sparse wide forests
    # auto-compact below it (tests/test_compact.py); this one uses ~550+
    forest = synthetic.generate_forest(900, 4, 700, seed=159)
    assert np.unique(forest.fids[~forest.is_leaf]).size > 480
    with pytest.raises(NotImplementedError):
        RankFoldEngine(forest, interpret=True)


@pytest.mark.parametrize("cols,min_groups", [
    (150, 5),    # just past the old 4-group (120-feature) cap
    (400, 10),   # mnist-class width (r5 wide extension, VERDICT r4 #1)
])
def test_wide_multi_group_matches_oracle(cols, min_groups):
    """> 128 virtual features: canonicalized rows widen past one vreg and
    the transform is forced onto the group-streamed v2 kernel; traversal
    contracts over G*128 lanes. Parity must hold with missing values.
    (The engine compacts to LIVE features first, so the group count is
    bounded below, not pinned.)"""
    forest = synthetic.generate_forest(30, 5, cols, leaf_prob=0.1, seed=162)
    # make sure the live-feature compaction can't dodge the wide path
    assert np.unique(forest.fids[~forest.is_leaf]).size > 128
    data = synthetic.generate_data(48, cols, missing_prob=0.1, seed=163)
    eng = RankFoldEngine(forest, row_tile=16, tree_tile=8, interpret=True)
    assert eng.groups >= min_groups
    assert eng._transform_v2  # forced v2 despite small threshold tables
    got = np.asarray(eng.predict(data))
    np.testing.assert_allclose(got, oracle.predict(forest, data), atol=1e-5)


def test_boundary_121_128_features_v2():
    """THE layout boundary (r5 review finding): 121-128 features give G=5
    plane groups whose last slice reaches lane 150 — x must widen to 256
    lanes even though F <= 128. Forced onto the v2 group-streamed transform
    via large per-feature threshold tables."""
    from tahoe_tpu.ops.rank_kernel import _x_lanes

    assert _x_lanes(120) == 128 and _x_lanes(121) == 256
    assert _x_lanes(128) == 256 and _x_lanes(130) == 256
    forest = synthetic.generate_forest(300, 8, 126, leaf_prob=0.05, seed=166)
    data = synthetic.generate_data(32, 126, missing_prob=0.1, seed=167)
    eng = RankFoldEngine(forest, row_tile=16, tree_tile=16, interpret=True)
    assert eng.groups == 5 and eng._transform_v2
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_wide_split_level_matches_oracle():
    """Wide (G=5) forest through the subtree-split traversal grid."""
    forest = synthetic.generate_forest(12, 7, 140, leaf_prob=0.1, seed=164)
    data = synthetic.generate_data(24, 140, missing_prob=0.05, seed=165)
    eng = RankFoldEngine(forest, row_tile=8, tree_tile=16, split_level=3,
                         interpret=True)
    assert eng.groups >= 5 and eng.split_level == 3
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_multi_group_features():
    """>30 features use G plane groups (G*128-lane matmul contraction)."""
    forest = synthetic.generate_forest(24, 6, 54, leaf_prob=0.1, seed=160)
    data = synthetic.generate_data(64, 54, missing_prob=0.1, seed=161)
    eng = RankFoldEngine(forest, row_tile=32, tree_tile=16, interpret=True)
    assert eng.groups == 2
    got = np.asarray(eng.predict(data))
    np.testing.assert_allclose(got, oracle.predict(forest, data), atol=1e-5)


@pytest.mark.parametrize("depth,trees,cols,tt,ls", [
    (5, 40, 8, 32, 2),    # TR<<Ls = 128, Db=3
    (7, 20, 34, 16, 3),   # two plane groups through the split path
    (8, 10, 8, 8, 5),     # SG=2 subtree groups per tree tile
    (11, 12, 18, 8, 6),   # deep: Db=5, streamed bottom subtrees
])
def test_split_level_matches_oracle(depth, trees, cols, tt, ls):
    """Subtree-blocked deep mode: identical results to the whole-level fold."""
    forest = synthetic.generate_forest(trees, depth, cols, leaf_prob=0.1,
                                       seed=depth * 7 + trees)
    data = synthetic.generate_data(53, cols, missing_prob=0.1, seed=depth + 3)
    eng = _engine(forest, row_tile=8, tree_tile=tt, split_level=ls)
    assert eng.split_level == ls
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_split_level_validation():
    forest = synthetic.generate_forest(10, 6, 8, seed=162)
    with pytest.raises(ValueError):
        # TR<<Ls < 128: roots span smaller than one vreg
        RankFoldEngine(forest, tree_tile=8, split_level=2, interpret=True)


@pytest.mark.parametrize("depth,trees,cols,tt,ls", [
    (5, 40, 8, 32, 2),    # SG=1: every step is its own top fold
    (8, 10, 8, 8, 5),     # SG=2 subtree groups per tree tile
    (11, 12, 18, 8, 6),   # deep: Db=5, streamed bottom subtrees
])
def test_stream_once_matches_row_outer(depth, trees, cols, tt, ls):
    """The stream-once grid (rows innermost, bottom slabs resident per
    chunk) is a pure schedule change: identical results to the row-outer
    split grid, including when rows span multiple chunks."""
    forest = synthetic.generate_forest(trees, depth, cols, leaf_prob=0.1,
                                       seed=depth * 7 + trees)
    data = synthetic.generate_data(53, cols, missing_prob=0.1, seed=depth + 3)
    eng = _engine(forest, row_tile=8, tree_tile=tt, split_level=ls,
                  stream_once=True)
    assert eng.stream_chunk_rows > 0
    # force multi-chunk execution: cap the chunk at two row tiles
    eng.cfg = eng.cfg._replace(stream_chunk_rows=16)
    import jax

    eng._predict = jax.jit(eng._predict_impl)
    got = np.asarray(eng.predict(data))
    base = _engine(forest, row_tile=8, tree_tile=tt, split_level=ls,
                   stream_once=False)
    assert base.stream_chunk_rows == 0
    np.testing.assert_allclose(got, np.asarray(base.predict(data)), atol=0)
    np.testing.assert_allclose(got, oracle.predict(forest, data), atol=1e-5)


@pytest.mark.parametrize("depth,trees,cols,band,ls", [
    (5, 30, 6, 37, None),   # band split active, no subtree split
    (6, 40, 10, 64, 1),     # band split + subtree split together
    (4, 12, 3, 16, None),   # heavy banding: ~3 bands per feature
])
def test_band_split_matches_oracle(depth, trees, cols, band, ls):
    """Features over the rank cap split into banded virtual features
    (quantize.band_split) with exact compare parity."""
    forest = synthetic.generate_forest(trees, depth, cols, leaf_prob=0.1,
                                       seed=depth * 11 + trees)
    data = synthetic.generate_data(71, cols, missing_prob=0.15, seed=5)
    eng = _engine(forest, row_tile=8, tree_tile=64, band=band, split_level=ls)
    assert eng._vf_base is not None
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_band_split_finite_missing():
    forest = synthetic.generate_forest(20, 5, 6, leaf_prob=0.1, missing=-999.0,
                                       seed=77)
    data = synthetic.generate_data(64, 6, missing_prob=0.2, missing=-999.0,
                                   seed=9)
    eng = _engine(forest, row_tile=8, tree_tile=32, band=23)
    assert eng._vf_base is not None
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_band_split_noop_when_under_cap():
    from tahoe_tpu.forest import quantize as qz

    forest = synthetic.generate_forest(6, 4, 5, seed=80)
    q = qz.quantize(forest)
    q2, base = qz.band_split(q)
    assert base is None and q2 is q


def test_deep_auto_split_feasible():
    """When whole-level tables bust the VMEM budget the engine picks a split
    level automatically and fits it (budget passed explicitly so the test is
    independent of the production default)."""
    from tahoe_tpu.config import TpuLimits

    limits = TpuLimits(vmem_bytes=16 * 1024 * 1024, vmem_fraction=0.8)
    forest = synthetic.generate_forest(8, 14, 10, leaf_prob=0.05, seed=163)
    eng = _engine(forest, row_tile=8, tree_tile=8, limits=limits)
    assert eng.split_level > 0
    need = RankFoldEngine.vmem_bytes(14, 8, 8, 1, eng.split_level)
    assert need <= limits.usable_vmem
    data = synthetic.generate_data(9, 10, missing_prob=0.1, seed=164)
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data), atol=1e-5
    )


def test_planes_chain_matches_predict():
    """predict_planes_k (the plane-resident serving chain) must equal the
    full predict for any chain length."""
    import jax

    forest = synthetic.generate_forest(12, 4, 7, seed=99)
    data = synthetic.generate_data(41, 7, missing_prob=0.1, seed=98)
    eng = _engine(forest, row_tile=16, tree_tile=16)
    want = np.asarray(eng.predict(data))
    planes = jax.jit(eng._transform)(eng.rank_tables, data.astype(np.float32))
    got = np.asarray(
        eng._predict_planes_k(eng.tables, planes, k=3)
    )[: data.shape[0]]
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("lead", ["none", "cond", "chunk"])
def test_lead_modes_match_oracle(lead):
    """cond_lead / chunk_lead are pure scheduling rewrites — identical math."""
    forest = synthetic.generate_forest(40, 6, 12, seed=55)
    data = synthetic.generate_data(33, 12, missing_prob=0.1, seed=56)
    eng = _engine(forest, row_tile=16, tree_tile=16,
                  cond_lead=(lead == "cond"), chunk_lead=(lead == "chunk"))
    got = np.asarray(eng.predict(data))
    want = oracle.predict(forest, data)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_compile_wall_guard():
    """Configs behind the measured Mosaic compile wall (Db >= 7 at >= 3
    plane groups: >13-min compile, r2) raise instead of hanging, and the
    auto-chooser never picks them (rank_kernel.compile_wall)."""
    import pytest

    from tahoe_tpu.ops.rank_kernel import RankFoldEngine as E

    assert E.compile_wall(14, 7, 3) is not None
    assert E.compile_wall(12, 5, 1) is None       # deep12 tr8/ls5: measured OK
    assert E.compile_wall(14, 8, 3) is None       # Db = 6: below the wall
    assert E.compile_wall(14, 0, 3) is None       # whole-level never walled
    assert 7 not in E.valid_split_levels(14, 1, groups=3)
    assert 7 in E.valid_split_levels(14, 1)       # unfiltered list keeps it

    # explicit request for a walled config must raise with the measured
    # reason, not hang a sweep
    deep = synthetic.generate_forest(4, 14, 6, seed=171)
    from tahoe_tpu.forest.compiler import rank_groups
    from tahoe_tpu.engine.feasibility import rank_virtual_cols

    if rank_groups(rank_virtual_cols(deep)) >= 3:
        with pytest.raises(NotImplementedError, match="compile"):
            _engine(deep, row_tile=8, tree_tile=1, split_level=7)


def test_fused_transform_matches_unfused():
    """r4 fused transform+traversal (row-outer split grid, int8 v2
    transform computed one row tile ahead into ping-pong scratch) must be
    BIT-identical to the two-kernel form and match the oracle — same math,
    different scheduling (rank_kernel._make_split_kernel fused form)."""
    forest = synthetic.generate_forest(64, 6, 12, seed=91)
    data = synthetic.generate_data(700, 12, missing_prob=0.1, seed=92)
    fused = _engine(forest, row_tile=128, tree_tile=8, split_level=4,
                    stream_once=False, fuse_transform=True)
    assert fused._fuse, "config should be fusion-eligible"
    unfused = _engine(forest, row_tile=128, tree_tile=8, split_level=4,
                      stream_once=False)
    assert not unfused._fuse
    got_f = np.asarray(fused.predict(data))
    got_u = np.asarray(unfused.predict(data))
    np.testing.assert_array_equal(got_f, got_u)
    np.testing.assert_allclose(got_f, oracle.predict(forest, data),
                               atol=1e-5)


def test_fused_single_row_tile():
    """One-row-tile batches hit the fused prologue's clamped x index
    (r + 1 == n_r) — planes0 must carry the whole batch."""
    forest = synthetic.generate_forest(150, 6, 10, seed=93)
    data = synthetic.generate_data(96, 10, missing_prob=0.05, seed=94)
    eng = _engine(forest, row_tile=128, tree_tile=8, split_level=4,
                  stream_once=False, fuse_transform=True)
    if not eng._fuse:
        import pytest

        pytest.skip("shape not fusion-eligible (v1 transform)")
    np.testing.assert_allclose(
        np.asarray(eng.predict(data)), oracle.predict(forest, data),
        atol=1e-5)
