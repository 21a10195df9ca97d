"""MXU rank kernel: traversal where node conditions come off the matrix unit.

The third traversal engine family, and the quantized-path flagship. Where the
fused fold kernel (fold_kernel.py) spends ~70% of its VPU time on the per-node
lane gather, this kernel moves feature selection AND threshold comparison onto
the MXU: each node's whole routing rule is one int8 column (built by
compiler.rank_normalize), and

    diff = planes @ R_d          # one [Rt,128] x [128, nodes] int8 matmul
    cond = diff >= 0             # 1 VPU op
    fold select                  # 1 VPU op

with rank quantization (quantize.py) making the int8 domain EXACT — the
realization of the north star's "INT8-quantized thresholds/features matching
CPU float predictions exactly". Missing values, def_left routing and exchange
inversion are all pre-compiled into the matrix columns (the negated planes /
subtree mirrors of ge-normalization), so the kernel body has no trace of
them. Structure (grid, tiling, accumulation, layouts) mirrors fold_kernel.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tahoe_tpu.config import TpuLimits
from tahoe_tpu.forest.compiler import RANK_MAX_COLS, levelize, rank_normalize
from tahoe_tpu.forest.quantize import (
    RankQuantizedForest,
    band_split,
    quantize,
    quantized_spec_for_engines,
)
from tahoe_tpu.forest.spec import ForestSpec
from tahoe_tpu.ops.fold_kernel import LANE, _cdiv, _round_up
from tahoe_tpu.ops.transform import apply_output_transform


def _x_lanes(num_cols: int) -> int:
    """Canonicalized-row lane count for ``num_cols`` virtual features.

    The group-streamed v2 transform slices x[:, 30g : 30(g+1)] per plane
    group, and the LAST group's slice reaches ceil(F/30)*30 — past the
    feature count. x must therefore carry G*30 lanes, rounded to whole
    vregs, NOT merely F: at F = 121..128 (G = 5) a 128-lane x would make
    group 4's slice a silently-clamped 8-wide partial and the concatenated
    xg a non-lane-aligned 618-wide block (caught in the r5 review — the
    aloi-class boundary shape). <= 120 features (G*30 <= 128) keep the
    historical single-vreg [R, 128] layout that the v1 flat transform and
    the fused transform+traversal path require."""
    from tahoe_tpu.forest.compiler import RANK_GROUP_COLS, rank_groups

    need = rank_groups(num_cols) * RANK_GROUP_COLS
    if need <= LANE:
        return LANE
    return _round_up(need, LANE)


class RankFoldConfig(NamedTuple):
    depth: int
    row_tile: int
    tree_tile: int
    padded_trees: int
    seg: Tuple[int, ...]
    leaf_seg: int
    interpret: bool = False
    # column chunk for the per-level matmul + fold (multiple of 128); wider
    # chunks mean fewer, better-pipelined MXU calls
    col_chunk: int = 512
    # plane-vector groups (compiler.rank_groups): planes are [Rt, 128*G],
    # matrices [128*G, cols] — one dot with a G*128-lane contraction
    groups: int = 1
    # deep-forest subtree blocking (mirrors fold_kernel's split_level, but the
    # streamed unit is the *matrix* working set, 128 B/node): levels >=
    # split_level are folded one subtree GROUP at a time through a third grid
    # dimension — a group is g = 128/tree_tile adjacent subtrees treated as a
    # virtual tile of 128 virtual trees, so every matmul chunk and the roots
    # scratch write stay 128-lane aligned. Root values accumulate in VMEM
    # scratch; the last group folds the top levels. 0 = whole-level fold.
    split_level: int = 0
    # issue each level's condition matmuls one level ahead of its selects
    # (MXU/VPU overlap experiment; see _make_kernel)
    cond_lead: bool = False
    # one-CHUNK lookahead instead: compute the next fold step's condition
    # matmul (MXU) before this step's select chain (VPU), keeping exactly one
    # [Rt, col_chunk] int32 cond live — cond_lead at the bottom level keeps a
    # whole level's masks (~8 MiB at depth 8) live, which spills
    chunk_lead: bool = False
    # tree-OUTER grid (non-split mode): grid = (tree tiles, row tiles) with
    # rows innermost, so each tree tile's matrices stream into VMEM ONCE per
    # predict instead of once per row tile (the dominant HBM traffic for
    # multi-tile forests); each step writes a partial-margin column of a
    # [rows, tree_tiles] slab, summed by XLA afterwards (the cross-tile
    # psum-on-chip analog of the reference's DeviceSegmentedReduce,
    # Struct.h:655-659)
    tree_outer: bool = False
    # split-mode analog of tree_outer: grid = (tree tiles, subtree groups,
    # row tiles) with rows INNERMOST, so each streamed bottom slab loads into
    # VMEM once per ROW CHUNK instead of once per row tile (deep-forest rank
    # is stream-bound; this divides the dominant HBM traffic by the number of
    # row tiles per chunk). Needs a roots scratch covering every row tile of
    # the chunk: [SG * chunk_tiles, Rt, 128] f32. 0 = off (row-outer grid);
    # > 0 = the row-chunk cap in rows (a multiple of row_tile, sized by the
    # engine so the scratch fits the VMEM budget).
    stream_chunk_rows: int = 0


def _make_kernel(cfg: RankFoldConfig):
    D = cfg.depth
    TR = cfg.tree_tile
    Rt = cfg.row_tile
    CH = cfg.col_chunk
    if cfg.split_level:
        return _make_split_kernel(cfg)

    def kernel(p_ref, *refs):
        mat_refs = refs[0:D]
        leaf_ref = refs[D]
        out_ref = refs[D + 1]

        planes = p_ref[:]  # [Rt, 128*G] int8

        def cond_chunk(d, c0, width):
            rhs = mat_refs[d][:, c0 : c0 + width]  # [128, width] int8
            diff = jax.lax.dot_general(
                planes, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return diff >= 0

        def level_conds(d):
            n = (1 << d) * TR
            width = min(CH, max(n, LANE))
            return [cond_chunk(d, c * CH, width)
                    for c in range(_cdiv(n, CH))]

        # cond_lead: issue the NEXT level's condition matmuls (MXU) before
        # this level's select chain (VPU) so Mosaic can overlap the units —
        # the conds depend only on planes x matrices, never on w.
        # chunk_lead: same idea at one-chunk granularity (flat step list,
        # single pending cond — minimal live masks).
        steps = []
        for d in range(D - 1, -1, -1):
            n = (1 << d) * TR
            n_chunks = _cdiv(n, CH)
            width = min(CH, max(n, LANE))
            for c in range(n_chunks):
                steps.append((d, c, n, n_chunks, width))
        pending = (cond_chunk(steps[0][0], steps[0][1] * CH, steps[0][4])
                   if (cfg.chunk_lead and steps) else None)
        cnds = level_conds(D - 1) if (cfg.cond_lead and D) else None
        w = None
        new_w = []
        for i, (d, c, n, n_chunks, width) in enumerate(steps):
            if c == 0 and cfg.cond_lead:
                this_cnds = cnds
                cnds = level_conds(d - 1) if d > 0 else None
            if cfg.chunk_lead:
                cnd = pending
                if i + 1 < len(steps):
                    d2, c2, _n2, _k2, w2 = steps[i + 1]
                    pending = cond_chunk(d2, c2 * CH, w2)
            elif cfg.cond_lead:
                cnd = this_cnds[c]
            else:
                cnd = cond_chunk(d, c * CH, width)
            if w is None and n >= CH:
                lo = jnp.broadcast_to(
                    leaf_ref[:, c * CH : (c + 1) * CH], (Rt, CH)
                )
                hi = jnp.broadcast_to(
                    leaf_ref[:, n + c * CH : n + (c + 1) * CH],
                    (Rt, CH),
                )
            elif w is None and n >= LANE:
                # direct ref slices (128-aligned offsets): slicing the
                # broadcast VALUE instead lets XLA rewrite it into a
                # broadcast of an offset-layout slice, which Mosaic's
                # vector.broadcast rejects ("Invalid input layout")
                lo = jnp.broadcast_to(leaf_ref[:, :n], (Rt, n))
                hi = jnp.broadcast_to(leaf_ref[:, n : 2 * n], (Rt, n))
            elif w is None:
                # sub-128-lane first fold: the leaf table stores the two
                # halves in separate 128-lane slots (_build_tables) so
                # both loads stay lane-aligned; select at full 128 width
                # (lanes >= n are pad, dropped by later slices/final sum)
                lo = jnp.broadcast_to(leaf_ref[:, :LANE], (Rt, LANE))
                hi = jnp.broadcast_to(leaf_ref[:, LANE : 2 * LANE],
                                      (Rt, LANE))
            elif n >= CH:
                lo, hi = w[c], w[c + n_chunks]
            else:
                lo, hi = w[0][:, :n], w[0][:, n : 2 * n]
                cnd = cnd[:, :n]
            new_w.append(jnp.where(cnd, hi, lo))
            if c == n_chunks - 1:  # level complete
                w = new_w
                new_w = []

        if w is None:  # depth 0
            w = [jnp.broadcast_to(leaf_ref[:, :LANE], (Rt, LANE))]
        wv = w[0][:, :TR] if TR < LANE else None
        if wv is None:
            partial = jnp.sum(w[0], axis=1, keepdims=True)
            for c in range(1, len(w)):
                partial = partial + jnp.sum(w[c], axis=1, keepdims=True)
        else:
            partial = jnp.sum(wv, axis=1, keepdims=True)

        if cfg.tree_outer:
            out_ref[0] = partial  # own [1, Rt, 1] slab of the partials array
            return

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            out_ref[:] = partial

        @pl.when(t != 0)
        def _acc():
            out_ref[:] = out_ref[:] + partial

    return kernel


def _make_split_kernel(cfg: RankFoldConfig, stream_r_tiles: int = 0,
                       fuse=None):
    """Subtree-blocked deep variant (split_level > 0).

    Row-outer form (stream_r_tiles == 0): grid = (row tiles, tree tiles,
    subtree groups), groups innermost. Each step folds one group of
    g = 128/TR bottom subtrees — laid out as a virtual tile of 128 virtual
    trees (col = c*128 + s_local*TR + tr, c the subtree-local bit-reversed
    node index) — and stores the group's 128 root values into scratch row s.
    The final group's step folds the top ``split_level`` levels over the
    scratch (whose flat column order is exactly the standard node-major
    layout at level Ls: col = s*TR + tr) and accumulates margins across tree
    tiles. The TPU rendition of streaming tree chunks through fast memory
    (reference SPLIT_FOREST, Struct.h:1414-1606) applied along the *depth*
    axis, where the rank form's 128 B/node matrices make whole-tree
    residency impossible.

    Stream-once form (stream_r_tiles = row tiles per chunk > 0): grid =
    (tree tiles, subtree groups, ROW tiles) with rows innermost, so each
    bottom slab stays VMEM-resident while every row tile of the chunk
    revolves through it — the slab streams once per chunk instead of once
    per row tile. Roots scratch holds every row tile's group roots
    ([SG * stream_r_tiles, Rt, 128], slot = s * stream_r_tiles + r); each
    (t, r) writes its own partial-margin slab (tree_outer-style), summed by
    XLA afterwards.

    Fused-transform form (``fuse`` = dict(F, S, Sp, paired, schedule,
    n_r_tiles); row-outer grid only, G == 1, int8 v2 transform): the planes
    input is replaced by raw canonicalized rows + the bucket tables, and the
    kernel rank-transforms ONE ROW TILE AHEAD into a ping-pong VMEM scratch
    — step (r, 0, 0) computes row tile r+1's planes (no same-step consumer,
    so Mosaic can overlap the transform's int8 matmuls with the step's
    VPU-bound fold chain) while every (r, t, s) step reads row tile r's
    planes from the other slot. Row tile 0's planes arrive precomputed
    (``planes0``, one standalone-transform dispatch over a single tile).
    Slot parity never collides: the writer targets (r+1) % 2, readers r % 2.
    """
    D = cfg.depth
    TR = cfg.tree_tile
    Rt = cfg.row_tile
    CH = cfg.col_chunk
    Ls = cfg.split_level
    Db = D - Ls
    SG = (TR << Ls) // LANE
    if fuse is not None:
        assert stream_r_tiles == 0 and cfg.groups == 1

    def kernel(*args):
        if fuse is not None:
            x_ref, planes0_ref, cmax_ref, digs_ref, qw_ref = args[:5]
            refs = args[5:]
        else:
            p_ref, refs = args[0], args[1:]
        top_refs = refs[0:Ls]
        bot_refs = refs[Ls:D]  # bot_refs[b] = level Ls+b, this group's slab
        leaf_ref = refs[D]
        out_ref = refs[D + 1]
        roots_ref = refs[D + 2]  # VMEM scratch [SG(*r_tiles), Rt, 128]

        if fuse is not None:
            from tahoe_tpu.ops.rank_transform import (
                _assemble_planes,
                rank_counts_from_x,
            )

            planes_sc = refs[D + 3]  # VMEM scratch [2, Rt, 128] int8
            r_ = pl.program_id(0)
            t_ = pl.program_id(1)
            s_ = pl.program_id(2)

            @pl.when((r_ == 0) & (t_ == 0) & (s_ == 0))
            def _seed():
                planes_sc[0] = planes0_ref[:]

            @pl.when((t_ == 0) & (s_ == 0))
            def _tf():
                # x_ref's index map fetches row tile min(r+1, last); the
                # last row tile's recompute lands in the unread parity slot
                q, nan_mask = rank_counts_from_x(
                    x_ref[:], F_loc=fuse["F"], S=fuse["S"], Sp=fuse["Sp"],
                    paired=fuse["paired"], int8_mode=True,
                    schedule=fuse["schedule"], row_tile=Rt,
                    cmax_row=lambda f: cmax_ref[f : f + 1, :],
                    digs_at=lambda i: digs_ref[i], qw=qw_ref[:],
                )
                nxt = _assemble_planes(q, nan_mask, fuse["F"], Rt)
                planes_sc[(r_ + 1) % 2] = nxt.astype(jnp.int8)

            planes = planes_sc[r_ % 2]  # [Rt, 128] int8
        else:
            planes = p_ref[:]  # [Rt, 128*G] int8

        def matcond(ref, c0, width):
            diff = jax.lax.dot_general(
                planes, ref[:, c0 : c0 + width], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return diff >= 0

        if stream_r_tiles:
            t = pl.program_id(0)
            s = pl.program_id(1)
            r = pl.program_id(2)

            def roots_slot(i):
                return i * stream_r_tiles + r
        else:
            s = pl.program_id(2)
            t = pl.program_id(1)

            def roots_slot(i):
                return i

        # ---- bottom fold: one group = 128 virtual trees of depth Db ----
        w = None
        for b in range(Db - 1, -1, -1):
            n = (1 << b) * LANE
            width = min(CH, n)
            n_chunks = n // width
            new_w = []
            for c in range(n_chunks):
                cnd = matcond(bot_refs[b], c * width, width)
                if w is None:
                    lo = jnp.broadcast_to(
                        leaf_ref[:, c * width : (c + 1) * width], (Rt, width))
                    hi = jnp.broadcast_to(
                        leaf_ref[:, n + c * width : n + (c + 1) * width],
                        (Rt, width))
                elif n >= CH:
                    lo, hi = w[c], w[c + n_chunks]
                else:
                    lo, hi = w[0][:, :n], w[0][:, n : 2 * n]
                new_w.append(jnp.where(cnd, hi, lo))
            w = new_w
        roots_ref[roots_slot(s)] = w[0]  # [Rt, 128] group root values

        # ---- top fold over all groups' roots, last group only ----
        @pl.when(s == SG - 1)
        def _top():
            def scratch_cols(c0, width):
                parts = [roots_ref[roots_slot(i)]
                         for i in range(c0 // LANE, (c0 + width) // LANE)]
                return parts[0] if len(parts) == 1 else jnp.concatenate(
                    parts, axis=1)

            w = None
            for d in range(Ls - 1, -1, -1):
                n = (1 << d) * TR
                width = min(CH, max(n, LANE))
                n_chunks = _cdiv(n, width)
                new_w = []
                for c in range(n_chunks):
                    cnd = matcond(top_refs[d], c * width, width)
                    if n < width:
                        cnd = cnd[:, :n]
                    if w is None and n >= LANE:
                        cw = min(width, n)
                        lo = scratch_cols(c * cw, cw)
                        hi = scratch_cols(n + c * cw, cw)
                    elif w is None:
                        sc = scratch_cols(0, LANE)
                        lo, hi = sc[:, :n], sc[:, n : 2 * n]
                    elif n >= CH:
                        lo, hi = w[c], w[c + n_chunks]
                    else:
                        lo, hi = w[0][:, :n], w[0][:, n : 2 * n]
                    new_w.append(jnp.where(cnd, hi, lo))
                w = new_w

            wv = w[0][:, :TR] if TR < LANE else None
            if wv is None:
                partial = jnp.sum(w[0], axis=1, keepdims=True)
                for c in range(1, len(w)):
                    partial = partial + jnp.sum(w[c], axis=1, keepdims=True)
            else:
                partial = jnp.sum(wv, axis=1, keepdims=True)

            if stream_r_tiles:
                out_ref[0] = partial  # own [1, Rt, 1] slab of the partials
                return

            @pl.when(t == 0)
            def _init():
                out_ref[:] = partial

            @pl.when(t != 0)
            def _acc():
                out_ref[:] = out_ref[:] + partial

    return kernel


def rank_fold_margins(cfg: RankFoldConfig, tables, planes_pad):
    rows = planes_pad.shape[0]
    Rt = cfg.row_tile
    G = cfg.groups
    Ls = cfg.split_level

    if Ls and cfg.stream_chunk_rows:
        # stream-once grid: rows innermost, bottom slabs load once per chunk
        Db = cfg.depth - Ls
        SG = (cfg.tree_tile << Ls) // LANE
        n_tiles = cfg.padded_trees // cfg.tree_tile
        from tahoe_tpu.ops.mosaic import compile_kwargs

        def run_chunk(planes_chunk):
            rc = planes_chunk.shape[0]
            r_tiles = rc // Rt
            grid = (n_tiles, SG, r_tiles)
            in_specs = [pl.BlockSpec((Rt, LANE * G), lambda t, s, r: (r, 0),
                                     memory_space=pltpu.VMEM)]
            for d in range(Ls):
                in_specs += [pl.BlockSpec((LANE * G, cfg.seg[d]),
                                          lambda t, s, r: (0, t),
                                          memory_space=pltpu.VMEM)]
            for b in range(Db):
                in_specs += [pl.BlockSpec(
                    (LANE * G, (1 << b) * LANE),
                    lambda t, s, r, _sg=SG: (0, t * _sg + s),
                    memory_space=pltpu.VMEM)]
            in_specs += [pl.BlockSpec(
                (1, (1 << Db) * LANE),
                lambda t, s, r, _sg=SG: (0, t * _sg + s),
                memory_space=pltpu.VMEM)]
            out_spec = pl.BlockSpec((1, Rt, 1), lambda t, s, r: (t, r, 0),
                                    memory_space=pltpu.VMEM)
            partials = pl.pallas_call(
                _make_split_kernel(cfg, stream_r_tiles=r_tiles),
                grid=grid,
                in_specs=in_specs,
                out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((n_tiles, rc, 1), jnp.float32),
                scratch_shapes=[pltpu.VMEM((SG * r_tiles, Rt, LANE),
                                           jnp.float32)],
                interpret=cfg.interpret,
                **compile_kwargs(cfg.interpret),
            )(planes_chunk, *tables)
            return jnp.sum(partials[:, :, 0], axis=0)

        C = max(Rt, (cfg.stream_chunk_rows // Rt) * Rt)
        outs = [run_chunk(planes_pad[c0 : min(c0 + C, rows)])
                for c0 in range(0, rows, C)]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    if Ls:
        return _split_row_outer(cfg, tables, planes_pad)

    return _nonsplit_margins(cfg, tables, planes_pad)


def _split_row_outer(cfg: RankFoldConfig, tables, planes_pad, fused=None):
    """Row-outer subtree-split grid = (row tiles, tree tiles, subtree
    groups), groups innermost.

    ``fused`` (built by rank_fold_margins_fused) swaps the planes input for
    raw canonicalized rows + the v2 bucket tables: the kernel transforms one
    row tile AHEAD into a ping-pong VMEM scratch (see _make_split_kernel's
    fused-transform form) — full predict never materializes planes in HBM
    and the transform's int8 matmuls get scheduled against the fold chain's
    VPU work instead of running as a separate serial kernel."""
    from tahoe_tpu.ops.mosaic import compile_kwargs

    Rt = cfg.row_tile
    G = cfg.groups
    Ls = cfg.split_level
    Db = cfg.depth - Ls
    SG = (cfg.tree_tile << Ls) // LANE
    rows = (fused["x"] if fused else planes_pad).shape[0]
    n_r = rows // Rt
    grid = (n_r, cfg.padded_trees // cfg.tree_tile, SG)

    if fused is None:
        in_specs = [pl.BlockSpec((Rt, LANE * G), lambda r, t, s: (r, 0),
                                 memory_space=pltpu.VMEM)]
        inputs = (planes_pad,)
        extra_scratch = []
        fuse_meta = None
    else:
        x, planes0, cmax, digs, qw = (
            fused[k] for k in ("x", "planes0", "cmax", "digs", "qw"))
        P, rows_dig, cols_dig = digs.shape
        F = cmax.shape[0]
        last = n_r - 1
        in_specs = [
            # row tile r+1 (clamped): the kernel transforms one tile ahead
            pl.BlockSpec((Rt, LANE),
                         lambda r, t, s, _l=last: (jnp.minimum(r + 1, _l), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rt, LANE), lambda r, t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, LANE), lambda r, t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, rows_dig, cols_dig), lambda r, t, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qw.shape[0], LANE), lambda r, t, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs = (x, planes0, cmax, digs, qw)
        extra_scratch = [pltpu.VMEM((2, Rt, LANE), jnp.int8)]
        fuse_meta = fused["meta"]

    for d in range(Ls):
        in_specs += [pl.BlockSpec((LANE * G, cfg.seg[d]),
                                  lambda r, t, s: (0, t),
                                  memory_space=pltpu.VMEM)]
    for b in range(Db):
        in_specs += [pl.BlockSpec((LANE * G, (1 << b) * LANE),
                                  lambda r, t, s, _sg=SG: (0, t * _sg + s),
                                  memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec((1, (1 << Db) * LANE),
                              lambda r, t, s, _sg=SG: (0, t * _sg + s),
                              memory_space=pltpu.VMEM)]
    out_spec = pl.BlockSpec((Rt, 1), lambda r, t, s: (r, 0),
                            memory_space=pltpu.VMEM)

    margins = pl.pallas_call(
        _make_split_kernel(cfg, fuse=fuse_meta),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        scratch_shapes=([pltpu.VMEM((SG, Rt, LANE), jnp.float32)]
                        + extra_scratch),
        interpret=cfg.interpret,
        **compile_kwargs(cfg.interpret),
    )(*inputs, *tables)
    return margins[:, 0]


def rank_fold_margins_fused(cfg: RankFoldConfig, tables, x_pad, planes0,
                            cmax, digs, qw, S: int, paired: bool,
                            schedule: str = "phase"):
    """Fused transform+traversal margins (row-outer split grid, G == 1,
    int8 v2 transform): x_pad [R_pad, 128] f32 canonicalized rows,
    planes0 the precomputed first row tile's planes."""
    assert cfg.split_level and cfg.groups == 1
    meta = dict(F=int(cmax.shape[0]), S=S, Sp=int(digs.shape[-1]) // 4,
                paired=paired, schedule=schedule)
    return _split_row_outer(
        cfg, tables, None,
        fused=dict(x=x_pad, planes0=planes0, cmax=cmax, digs=digs, qw=qw,
                   meta=meta))


def _nonsplit_margins(cfg: RankFoldConfig, tables, planes_pad):
    rows = planes_pad.shape[0]
    Rt = cfg.row_tile
    G = cfg.groups
    from tahoe_tpu.ops.mosaic import compile_kwargs

    n_tiles = cfg.padded_trees // cfg.tree_tile
    if cfg.tree_outer:
        # trees outer, rows inner: each tree tile's matrices load once and
        # stay VMEM-resident while every row tile revolves through; partial
        # margins land in a [rows, n_tiles] slab (one column per tile,
        # written exactly once), reduced outside the kernel
        grid = (n_tiles, rows // Rt)
        in_specs = [pl.BlockSpec((Rt, LANE * G), lambda t, r: (r, 0),
                                 memory_space=pltpu.VMEM)]
        for d in range(cfg.depth):
            in_specs += [pl.BlockSpec((LANE * G, cfg.seg[d]),
                                      lambda t, r: (0, t),
                                      memory_space=pltpu.VMEM)]
        in_specs += [pl.BlockSpec((1, cfg.leaf_seg), lambda t, r: (0, t),
                                  memory_space=pltpu.VMEM)]
        # 3-D partials so the block's last-two dims are (Rt, 1) — Pallas
        # requires the minor block dim be 128-divisible or span the array
        out_spec = pl.BlockSpec((1, Rt, 1), lambda t, r: (t, r, 0),
                                memory_space=pltpu.VMEM)
        partials = pl.pallas_call(
            _make_kernel(cfg),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles, rows, 1), jnp.float32),
            interpret=cfg.interpret,
            **compile_kwargs(cfg.interpret),
        )(planes_pad, *tables)
        return jnp.sum(partials[:, :, 0], axis=0)

    grid = (rows // Rt, n_tiles)

    in_specs = [pl.BlockSpec((Rt, LANE * G), lambda r, t: (r, 0),
                             memory_space=pltpu.VMEM)]
    for d in range(cfg.depth):
        in_specs += [pl.BlockSpec((LANE * G, cfg.seg[d]), lambda r, t: (0, t),
                                  memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec((1, cfg.leaf_seg), lambda r, t: (0, t),
                              memory_space=pltpu.VMEM)]
    out_spec = pl.BlockSpec((Rt, 1), lambda r, t: (r, 0),
                            memory_space=pltpu.VMEM)

    margins = pl.pallas_call(
        _make_kernel(cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        interpret=cfg.interpret,
        **compile_kwargs(cfg.interpret),
    )(planes_pad, *tables)
    return margins[:, 0]


class RankFoldEngine:
    """Rank-quantize a forest and run it through the MXU kernel.

    ``predict(data)`` takes raw f32 rows: the rank transform + plane encoding
    run on-device inside the same jit (a one-time-per-batch cost proportional
    to the number of distinct thresholds). ``predict_planes`` skips the
    transform for pre-encoded inputs.
    """

    def __init__(self, forest: ForestSpec, *, row_tile: int = 256,
                 tree_tile: int = 64, interpret: bool = False,
                 split_level: int | None = None, band: int | None = None,
                 prequantized=None, cond_lead: bool = False,
                 chunk_lead: bool = False,
                 tree_outer: bool | None = None, col_chunk: int | None = None,
                 stream_once: bool | None = None,
                 transform_schedule: str = "phase",
                 transform_row_tile: int | None = None,
                 fuse_transform: bool | None = None,
                 limits: TpuLimits = TpuLimits()):
        self._raw_missing = forest.missing
        self._transform_schedule = transform_schedule
        # the transform's matmuls are weight-load bound below ~1024 rows per
        # dot (scripts/unit_bench.py r2: full MXU rate needs M >= ~1024);
        # decoupling its row tile from the traversal's lets both run at their
        # own sweet spot
        self._transform_rt = transform_row_tile
        if prequantized is not None:
            # (RankQuantizedForest, gather, raw_missing) from a caller that
            # quantized a larger forest once and is handing us a tree subset
            # (depth-bucketed rank execution shares one transform). ``gather``
            # is the FINAL data-column index (compaction + band split
            # composed by the caller), or None.
            self.q, self._vf_base, self._raw_missing = prequantized
        else:
            # drop unreachable filler levels before quantization
            # (complete-tree storage; see compiler.reachable_depths) —
            # shrinks matrices AND threshold tables; then compact to live
            # features (wide gisette-class forests reference only a subset)
            from tahoe_tpu.forest.compiler import (
                compact_features,
                reachable_depths,
                truncate_depth,
            )

            forest = truncate_depth(
                forest, int(reachable_depths(forest).max(initial=0))
            )
            forest, col_index = compact_features(forest)
            if forest.num_cols > RANK_MAX_COLS:
                raise NotImplementedError(
                    f"rank-MXU kernel supports <= {RANK_MAX_COLS} live "
                    f"features; got {forest.num_cols}"
                )
            self.q = quantize(forest)
            # features with more distinct thresholds than the plane
            # encoding's rank cap split into banded virtual features
            # (quantize.band_split); rows expand by a column gather in
            # _canonicalize
            self.q, vf_base = band_split(self.q, band)
            # compose compaction with band expansion into one data gather
            if col_index is None:
                self._vf_base = vf_base
            elif vf_base is None:
                self._vf_base = col_index
            else:
                self._vf_base = col_index[vf_base]
        if self.q.spec.num_cols > RANK_MAX_COLS:
            raise NotImplementedError(
                f"banded forest needs {self.q.spec.num_cols} virtual "
                f"features > {RANK_MAX_COLS}"
            )
        qspec = quantized_spec_for_engines(self.q)
        lev = levelize(qspec)

        self.depth = lev.depth
        self.num_trees = lev.num_trees
        self.num_cols = lev.num_cols
        self.output = lev.output
        self.global_bias = lev.global_bias
        self.threshold = lev.threshold
        self.row_tile = row_tile
        tt = min(tree_tile, max(lev.num_trees, 8))
        self.tree_tile = 1 << (tt - 1).bit_length()
        self.interpret = interpret
        self.cond_lead = cond_lead
        self.chunk_lead = chunk_lead
        self.tree_outer = tree_outer
        from tahoe_tpu.forest.compiler import rank_groups

        self.groups = rank_groups(lev.num_cols)

        if split_level is None:
            # smallest split level whose peak VMEM fits (0 = whole-level
            # fold); deepest split as last resort. Compile-walled levels
            # (measured >13-min Mosaic compiles) are never auto-chosen.
            # At G=1 the fit test deliberately stays on the DERATED budget
            # (explicit configs get the full budget below): the halved
            # budget doubles as a performance prior — it lands on ls4 for
            # SUSY-class shapes, the measured best (ls3/ls5 were 5-10%
            # slower, scripts/r4_headline{,3}.py), where the full budget
            # would pick the unmeasured ls2 with its 4x w_live. At G>=2
            # the derate was a correctness guard, now conditioned on the
            # unrolled-bottom depth (split_budget): deep14's measured-best
            # ls8 (Db=6) fits only under the full budget
            # (scripts/derate_probe.py r4).
            def fit_budget(ls):
                if self.groups == 1:
                    return self.split_budget(ls, limits)
                return self.split_budget(ls, limits, self.groups, lev.depth)

            candidates = self.valid_split_levels(lev.depth, self.tree_tile,
                                                 self.groups)
            split_level = next(
                (ls for ls in candidates if self.vmem_bytes(
                    lev.depth, row_tile, self.tree_tile, self.groups, ls
                ) <= fit_budget(ls)),
                min(candidates, key=lambda ls: self.vmem_bytes(
                    lev.depth, row_tile, self.tree_tile, self.groups, ls
                ) / fit_budget(ls)),
            )
        elif split_level > 0 and split_level not in self.valid_split_levels(
            lev.depth, self.tree_tile
        ):
            raise ValueError(
                f"split_level {split_level} invalid for depth {lev.depth}, "
                f"tree_tile {self.tree_tile}"
            )
        wall = self.compile_wall(lev.depth, split_level, self.groups)
        if wall is not None:
            raise NotImplementedError(wall)
        self.split_level = split_level
        # wider matmul chunks measured best on v5e: 1024 for the whole-level
        # fold (r2) AND for shallow split engines (r3: SUSY ls4/rt1024
        # planes 0.108 at cc1024 vs 0.117 at cc512, scripts/r3_headline.py);
        # deep split kernels keep the narrower proven 512 (only config
        # family measured there)
        self.col_chunk = col_chunk if col_chunk is not None else (
            1024 if (split_level == 0 or lev.depth <= 10) else 512)

        need = self.vmem_bytes(lev.depth, row_tile, self.tree_tile,
                               self.groups, split_level)
        budget = self.split_budget(split_level, limits, self.groups,
                                   lev.depth)
        if not interpret and need > budget:
            raise ValueError(
                f"tile needs ~{need/2**20:.1f} MiB VMEM > budget "
                f"{budget/2**20:.1f} MiB"
            )

        # stream-once split grid (rows innermost): the roots scratch must
        # hold every row tile of a chunk, so size the chunk by the VMEM
        # headroom left over after the per-row-tile working set
        self.stream_chunk_rows = 0
        if split_level and stream_once is not False:
            scratch_tile = row_tile * (self.tree_tile << split_level) * 4
            max_tiles = (budget - (need - scratch_tile)) // scratch_tile
            if max_tiles >= 2 or stream_once:
                self.stream_chunk_rows = int(max(1, max_tiles)) * row_tile

        self._build_tables(lev)

        # fused transform+traversal (r4): the row-outer split kernel can
        # rank-transform one row tile AHEAD into a ping-pong VMEM scratch
        # (G == 1, int8 v2 transform only) so full predict never
        # materializes planes in HBM. A/B-measured on chip at the headline
        # config (FUSED_AB_r04.json: fused 0.1228 vs unfused 0.1200
        # us/sample, bit-identical) — Mosaic serializes compute across grid
        # steps, so the hoped-for MXU/VPU overlap does not materialize and
        # the fusion is a wash. Default OFF; kept as an opt-in
        # (fuse_transform=True) with CPU bit-parity tests for future Mosaic
        # schedulers.
        self._fuse = bool(
            fuse_transform
            and self._transform_v2
            and self.groups == 1
            and self.split_level > 0
            and self.stream_chunk_rows == 0
            and self.rank_tables[1].dtype == jnp.int8
        )
        if self._fuse:
            digs_bytes = int(self.rank_tables[1].size)
            extra = (digs_bytes                    # digit planes (int8)
                     + 2 * row_tile * LANE         # ping-pong planes scratch
                     + 2 * row_tile * LANE * 4     # x block (double-buffered)
                     + row_tile * LANE             # planes0
                     + self.rank_tables[0].size * 4 + 3 * LANE * LANE)
            if not interpret and need + extra > budget:
                raise ValueError(
                    f"fused transform needs ~{(need + extra)/2**20:.1f} MiB "
                    f"VMEM > budget {budget/2**20:.1f} MiB"
                )
        self._predict = jax.jit(self._predict_impl)
        self._predict_k = jax.jit(self._chain_impl, static_argnames=("k",))
        self._predict_planes_k = jax.jit(self._chain_planes_impl,
                                         static_argnames=("k",))

    # ------------------------------------------------------------------
    @staticmethod
    def vmem_bytes(depth: int, row_tile: int, tree_tile: int,
                   groups: int = 1, split_level: int = 0) -> int:
        if split_level:
            db = depth - split_level
            top = tree_tile * (1 << split_level) * LANE * groups  # int8
            bot = 2 * (1 << db) * LANE * LANE * groups  # streamed, x2 dbuf
            leaf = 2 * (1 << db) * LANE * 4
            scratch = row_tile * (tree_tile << split_level) * 4
            w_live = 2 * row_tile * (1 << max(db - 1, 0)) * LANE * 4
            return int(top + bot + leaf + scratch + w_live
                       + row_tile * LANE * groups * 8)
        nodes = (1 << depth) - 1
        mats = tree_tile * nodes * 128 * groups  # int8 matrices
        leaf = tree_tile * (1 << depth) * 4
        w_top = row_tile * (1 << max(depth - 1, 0)) * tree_tile * 4
        return int(mats + leaf + w_top + w_top // 2
                   + row_tile * LANE * groups * 8)

    @staticmethod
    def split_budget(split_level: int, limits: TpuLimits,
                     groups: int = 2, depth: int | None = None) -> int:
        """Budget the vmem estimate is compared against. Whole-level (0)
        estimates are validated against real Mosaic compiles up to 40.5 MiB
        actual. Multi-group SPLIT estimates ran ~2.4x under actual on the
        r1 failure (est 39.9, actual 97.3 scoped OOM) — but every probed
        config with a SHALLOW unrolled bottom (Db = depth - Ls <= 6)
        tracks its estimate on the real chip: G=1 rt2048/ls4 est 36.4
        (r4_headline3) and G=3 Db=6 est 24.8-45.4 MiB, four-for-four
        compile+parity (scripts/derate_probe.py r4). The r1 OOM shape was
        a deeper bottom, where Mosaic's scheduler holds more of the 2^Db
        unrolled fold live than the w_live term models. That OOM mechanism
        is GROUP-INDEPENDENT (ADVICE r4 #2): the full budget is granted
        only for shallow unrolled bottoms (Db <= 6, the probed regime — at
        any group count), half otherwise; callers that omit ``depth`` stay
        conservative (the G=1 auto-chooser deliberately does, as its
        measured performance prior — see __init__)."""
        if split_level == 0:
            return limits.usable_vmem
        if depth is not None and depth - split_level <= 6:
            return limits.usable_vmem
        return limits.usable_vmem // 2

    @staticmethod
    def compile_wall(depth: int, split_level: int, groups: int):
        """Measured Mosaic compile-time wall (VERDICT r2 weak #3): the
        subtree-split kernel unrolls the bottom Db = depth - Ls levels per
        group; at Db >= 7 with >= 3 plane groups the statement stream blew
        past 13 minutes of Mosaic compile on v5e without finishing (deep-14
        G=3 tr1/ls7, round 2 — killed). Configs in that region are treated
        infeasible with this measured reason rather than silently hanging a
        sweep. (Db = 7 at G <= 2 compiles fine: deep-12 tr8/ls5, measured
        0.625 us/sample.)"""
        if split_level and depth - split_level >= 7 and groups >= 3:
            return ("subtree-split with depth-Ls >= 7 at >= 3 plane groups: "
                    "Mosaic compile measured >13 min on v5e (r2) — "
                    "infeasible by compile time")
        return None

    @classmethod
    def valid_split_levels(cls, depth: int, tree_tile: int,
                           groups: int | None = None) -> list:
        """Usable split levels, smallest first (0 = whole-level fold).
        Subtree blocking needs the roots span to cover whole 128-lane vregs
        (tree_tile * 2^Ls >= 128) and tree_tile <= 128 (virtual-tile
        grouping), leaving at least one bottom level. With ``groups`` given,
        levels behind the measured compile-time wall are excluded."""
        out = [0]
        if tree_tile <= LANE:
            for ls in range(1, depth):
                if (tree_tile << ls) >= LANE:
                    if groups is not None and cls.compile_wall(
                            depth, ls, groups):
                        continue
                    out.append(ls)
        return out

    @classmethod
    def min_vmem_bytes(cls, depth: int, row_tile: int, tree_tile: int,
                       groups: int = 1) -> int:
        """Min budget-equivalent VMEM over allowed split levels (for
        feasibility; compare against limits.usable_vmem). DEEP-bottom
        (Db >= 7) split estimates are doubled to mirror split_budget's
        derating (group-independent, ADVICE r4 #2); compile-walled levels
        are excluded."""
        return min(
            cls.vmem_bytes(depth, row_tile, tree_tile, groups, ls)
            * (1 if (ls == 0 or depth - ls <= 6) else 2)
            for ls in cls.valid_split_levels(depth, tree_tile, groups)
        )

    # ------------------------------------------------------------------
    def _build_tables(self, lev) -> None:
        TR = self.tree_tile
        T = lev.num_trees
        Tp = _round_up(max(T, TR), TR)
        self.padded_trees = Tp
        D = lev.depth

        mats, leaf = rank_normalize(lev)

        def pad_trees_mat(m):
            # m [128, T, n] int8 → [128, Tp, n]; padded trees are all-zero
            # columns except the pass-through constant → diff = -1
            if m.shape[1] == Tp:
                return m
            L = m.shape[0]  # 128 * groups
            pad = np.zeros((L, Tp - m.shape[1], m.shape[2]), np.int8)
            from tahoe_tpu.forest.compiler import RANK_LANE_C1

            pad[RANK_LANE_C1] = -1
            return np.concatenate([m, pad], axis=1)

        def tile_node_major_mat(m):
            # [128G, Tp, n] → [128G, ntiles*seg] ordered (tile, node, tree)
            L, _, n = m.shape
            t = np.ascontiguousarray(
                m.reshape(L, Tp // TR, TR, n).transpose(1, 0, 3, 2)
            ).reshape(Tp // TR, L, n * TR)
            seg = _round_up(n * TR, LANE)
            if seg != n * TR:
                padb = np.zeros((Tp // TR, L, seg - n * TR), np.int8)
                from tahoe_tpu.forest.compiler import RANK_LANE_C1

                padb[:, RANK_LANE_C1, :] = -1
                t = np.concatenate([t, padb], axis=2)
            # flatten tiles along the column axis: [128G, ntiles*seg]
            return np.ascontiguousarray(t.transpose(1, 0, 2)).reshape(L, -1)

        Ls = self.split_level

        def tile_subtree_mat(m, b):
            """Split-mode bottom level Ls+b: [128G, Tp, 2^(Ls+b)] (node
            j = c*2^Ls + s, c the subtree-local bit-reversed index) →
            [128G, ntiles*SG*2^b*128] ordered (tile, group, c, s_local, tr)
            so each (tree tile, subtree group) block is one contiguous slab
            with col = c*128 + s_local*TR + tr."""
            L = m.shape[0]
            g = LANE // TR
            SG = (TR << Ls) // LANE
            m = m.reshape(L, Tp // TR, TR, 1 << b, SG, g)
            t = np.ascontiguousarray(m.transpose(1, 4, 0, 3, 5, 2))
            t = t.reshape(Tp // TR, SG, L, (1 << b) * LANE)
            return np.ascontiguousarray(t.transpose(2, 0, 1, 3)).reshape(L, -1)

        def tile_subtree_leaf(a):
            g = LANE // TR
            SG = (TR << Ls) // LANE
            a = a.reshape(Tp // TR, TR, 1 << (D - Ls), SG, g)
            t = np.ascontiguousarray(a.transpose(0, 3, 2, 4, 1))
            return t.reshape(1, -1)

        def pad_tree_axis(a, fill):
            if a.shape[0] == Tp:
                return a
            pad = np.full((Tp - a.shape[0],) + a.shape[1:], fill, dtype=a.dtype)
            return np.concatenate([a, pad], axis=0)

        def tile_node_major(a, fill):
            n = a.shape[1]
            t = np.ascontiguousarray(a.reshape(Tp // TR, TR, n).transpose(0, 2, 1))
            t = t.reshape(Tp // TR, n * TR)
            if D >= 1 and n * TR < 2 * LANE:
                # sub-128-lane first fold: store the lo/hi leaf halves in
                # separate 128-lane slots so the kernel's first-fold loads
                # stay lane-aligned (see _make_kernel's ``w is None`` branch)
                half = n * TR // 2
                padb = np.full((Tp // TR, LANE - half), fill, dtype=a.dtype)
                t = np.concatenate([t[:, :half], padb, t[:, half:], padb],
                                   axis=1)
                return t.reshape(1, -1)
            seg = _round_up(n * TR, LANE)
            if seg != n * TR:
                padb = np.full((Tp // TR, seg - n * TR), fill, dtype=a.dtype)
                t = np.concatenate([t, padb], axis=1)
            return t.reshape(1, -1)

        leaf_p = pad_tree_axis(leaf, np.float32(0))
        if Ls:
            self.seg = [_round_up((1 << d) * TR, LANE) for d in range(Ls)]
            self.leaf_seg = (1 << (D - Ls)) * LANE
            padded = [pad_trees_mat(m) for m in mats]
            tabs = [jnp.asarray(tile_node_major_mat(padded[d]))
                    for d in range(Ls)]
            tabs += [jnp.asarray(tile_subtree_mat(padded[d], d - Ls))
                     for d in range(Ls, D)]
            self.tables = (*tabs, jnp.asarray(tile_subtree_leaf(leaf_p)))
        else:
            self.seg = [_round_up((1 << d) * TR, LANE) for d in range(D)]
            if D >= 1 and (1 << D) * TR < 2 * LANE:
                self.leaf_seg = 2 * LANE  # split-halves layout, see below
            else:
                self.leaf_seg = _round_up((1 << D) * TR, LANE)
            tabs = [jnp.asarray(tile_node_major_mat(pad_trees_mat(m)))
                    for m in mats]
            self.tables = (*tabs,
                           jnp.asarray(tile_node_major(leaf_p, np.float32(0))))
        # rank-transform tables: the bucketed v2 kernel wins once tables are
        # big enough to amortize its fixed per-feature cost; the flat v1
        # compare sweep wins for hist-style (<=256-threshold) tables
        from tahoe_tpu.ops.rank_transform import (
            build_bucket_tables,
            pad_threshold_tables,
        )

        u_pad = pad_threshold_tables(self.q.tables, self.num_cols)
        # v2 for big tables (amortizes per-threshold cost) AND for > 128
        # virtual features (the v1 flat kernel holds x in one vreg; the v2
        # group-streamed grid handles any width one 30-feature group at a
        # time — the r5 wide-forest path)
        self._transform_v2 = u_pad.shape[1] > 256 or self.num_cols > LANE
        if self._transform_v2:
            cmax, digs, self._bucket_s, self._bucket_paired = (
                build_bucket_tables(self.q.tables, self.num_cols)
            )
            self.rank_tables = (cmax, digs)
        else:
            self.rank_tables = (jnp.asarray(u_pad),)
        self.cfg = RankFoldConfig(
            depth=D, row_tile=self.row_tile, tree_tile=TR, padded_trees=Tp,
            seg=tuple(self.seg), leaf_seg=self.leaf_seg,
            interpret=self.interpret, groups=self.groups,
            split_level=self.split_level, cond_lead=self.cond_lead,
            chunk_lead=self.chunk_lead, col_chunk=self.col_chunk,
            tree_outer=(self.tree_outer if self.tree_outer is not None
                        else self.split_level == 0),
            stream_chunk_rows=self.stream_chunk_rows,
        )

    # ------------------------------------------------------------------
    def _canonicalize(self, data):
        """f32 rows → NaN-missing, virtual-feature-expanded, 128-lane-padded,
        row_tile-padded. Missing detection uses the ORIGINAL forest sentinel
        (band splitting replaces the rank-domain spec's sentinel with NaN but
        raw rows still carry the original)."""
        x = data.astype(jnp.float32)
        missing = self._raw_missing
        if np.isnan(np.float32(missing)):
            miss = jnp.isnan(x)
        else:
            from tahoe_tpu.config import MISSING_EPS

            miss = jnp.abs(x - jnp.float32(missing)) <= jnp.float32(MISSING_EPS)
        x = jnp.where(miss, jnp.float32(np.nan), x)
        if self._vf_base is not None:
            x = x[:, self._vf_base]  # duplicate base columns per band
        x = jnp.pad(x, ((0, (-x.shape[0]) % self.row_tile),
                        (0, _x_lanes(x.shape[1]) - x.shape[1])))
        return x

    def _transform(self, rank_tables, data):
        """f32 rows → int8 plane vectors via the fused Pallas transform
        (rank_transform.py); output row count is row_tile-padded."""
        from tahoe_tpu.ops.rank_transform import (
            rank_planes_kernel,
            rank_planes_kernel_v2,
        )

        x = self._canonicalize(data)
        rt = self._transform_rt or self.row_tile
        pad = (-x.shape[0]) % rt
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, x.shape[1]), jnp.float32)], axis=0)
        if self._transform_v2:
            cmax, digs = rank_tables
            return rank_planes_kernel_v2(
                x, cmax, digs, self._bucket_s, self._bucket_paired,
                row_tile=rt, interpret=self.interpret,
                schedule=self._transform_schedule,
            )
        return rank_planes_kernel(
            x, rank_tables[0], row_tile=rt,
            interpret=self.interpret,
        )

    def _margins_planes(self, tables, planes):
        rows = planes.shape[0]
        pad = (-rows) % self.row_tile
        if pad:
            planes = jnp.concatenate(
                [planes, jnp.zeros((pad, LANE * self.groups), jnp.int8)],
                axis=0,
            )
        return rank_fold_margins(self.cfg, tables, planes)[:rows]

    def _predict_impl(self, tables, rank_tables, data):
        rows = data.shape[0]
        if self._fuse:
            from tahoe_tpu.ops.rank_transform import (
                _qw_weights,
                rank_planes_kernel_v2,
            )

            cmax, digs = rank_tables
            x = self._canonicalize(data)
            # row tile 0's planes: one standalone-transform dispatch over a
            # single tile seeds the fused kernel's ping-pong scratch
            planes0 = rank_planes_kernel_v2(
                x[: self.row_tile], cmax, digs, self._bucket_s,
                self._bucket_paired, row_tile=self.row_tile,
                interpret=self.interpret, schedule=self._transform_schedule,
            )
            qw = _qw_weights(int(digs.shape[-1]) // 4, self._bucket_paired,
                             True)
            margins = rank_fold_margins_fused(
                self.cfg, tables, x, planes0, cmax, digs, qw,
                self._bucket_s, self._bucket_paired,
                schedule=self._transform_schedule,
            )[:rows]
        else:
            planes = self._transform(rank_tables, data)
            margins = self._margins_planes(tables, planes)[:rows]
        return apply_output_transform(
            margins, self.num_trees, self.output, self.global_bias,
            self.threshold, jnp,
        )

    def _chain_impl(self, tables, rank_tables, data, k):
        def body(_, acc):
            return self._predict_impl(tables, rank_tables, data + acc[0] * 0.0)

        return jax.lax.fori_loop(0, k, body, jnp.zeros(data.shape[0], jnp.float32))

    def _chain_planes_impl(self, tables, planes, k):
        def body(_, acc):
            p = planes + (acc[0] * 0.0).astype(planes.dtype)
            margins = self._margins_planes(tables, p)
            return apply_output_transform(
                margins, self.num_trees, self.output, self.global_bias,
                self.threshold, jnp,
            )

        return jax.lax.fori_loop(
            0, k, body, jnp.zeros(planes.shape[0], jnp.float32))

    # ------------------------------------------------------------------
    def predict(self, data) -> jax.Array:
        return self._predict(self.tables, self.rank_tables, jnp.asarray(data))

    def predict_k(self, data, k: int) -> jax.Array:
        return self._predict_k(self.tables, self.rank_tables,
                               jnp.asarray(data), k=k)

    def predict_planes(self, planes) -> jax.Array:
        """Predict from pre-encoded int8 plane vectors (steady-state path)."""
        margins = self._margins_planes(self.tables, jnp.asarray(planes))
        return apply_output_transform(
            margins, self.num_trees, self.output, self.global_bias,
            self.threshold, jnp,
        )
