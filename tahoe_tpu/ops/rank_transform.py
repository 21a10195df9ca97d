"""Fused Pallas rank-transform: f32 rows → int8 rank planes in one pass.

The rank transform (rank_f(x) = #{u in U_f : u <= x}, quantize.py) is the
per-batch preprocessing of the rank-MXU engine. Its naive XLA form
materializes the [rows, F, K] compare tensor through HBM (~0.30 us/row for
SUSY-scale threshold counts); this kernel keeps the whole thing in VMEM:
per row tile, for each feature, one broadcast compare of the row's value
against the feature's sorted threshold row and a lane reduction, then the
base-127 plane encoding (quantize.encode_rank_planes_*) emitted directly.

The v1 (flat) kernel and the bf16 v2 fallback emit int32 plane vectors with
an XLA cast to int8 outside (the round-1 Mosaic build could not truncate to
int8 in-kernel). The default int8 v2 path writes int8 planes directly AND
runs its one-hot digit matmuls at the MXU int8 rate — both proven exact on
the real v5e in r4 (scripts/int8_cast_probe.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tahoe_tpu.forest.compiler import (
    RANK_BASE,
    RANK_GROUP_COLS,
    RANK_MAX_COLS,
    rank_groups,
)
from tahoe_tpu.ops.fold_kernel import LANE, _round_up
from tahoe_tpu.ops.mosaic import compile_kwargs

# Default digit-plane dtype for the v2 bucketed transform. int8 runs the
# one-hot digit matmuls (~70% of transform MXU work) at 2x the bf16 rate;
# proven exact + compiling on the real v5e in r4 (scripts/int8_cast_probe.py,
# scripts/int8_transform_smoke.py). Flip to False to force the bf16 path.
INT8_TRANSFORM = True


def _assemble_planes(q, nan_mask, F: int, row_tile: int):
    """int32 ranks [Rt, F] + missing mask [Rt, F] → plane vector
    [Rt, 128*G]. Lane map must match compiler.rank_normalize: per group,
    30-lane slots [0,30) qh | [30,60) ql | [60,90) -qh | [90,120) -ql |
    120:127 121:1 (constant lanes present in every group; the matrices use
    group 0's)."""
    G = rank_groups(F)
    qh = q // RANK_BASE
    ql = q - qh * RANK_BASE
    m128 = jnp.int32(-128)

    def seg(vals):
        return jnp.where(nan_mask != 0, m128, vals)

    planes = (seg(qh), seg(ql), seg(-qh), seg(-ql))
    tail = jnp.concatenate(
        [
            jnp.full((row_tile, 1), 127, jnp.int32),
            jnp.full((row_tile, 1), 1, jnp.int32),
            jnp.zeros((row_tile, 6), jnp.int32),
        ],
        axis=1,
    )
    blocks = []
    for g in range(G):
        f0 = g * RANK_GROUP_COLS
        w = min(RANK_GROUP_COLS, F - f0)
        zfill = (jnp.zeros((row_tile, RANK_GROUP_COLS - w), jnp.int32)
                 if w < RANK_GROUP_COLS else None)
        for p in planes:
            blocks.append(p[:, f0 : f0 + w])
            if zfill is not None:
                blocks.append(zfill)
        blocks.append(tail)
    return jnp.concatenate(blocks, axis=1)


def _make_kernel(F: int, k_pad: int, row_tile: int):
    G = rank_groups(F)

    def kernel(x_ref, u_ref, out_ref):
        x = x_ref[:]  # [Rt, 128] f32, missing already canonicalized to NaN

        ranks = []
        for f in range(F):
            xc = x[:, f : f + 1]
            # NaN-padded threshold rows make padding contribute 0; NaN x
            # contributes 0 too and is fixed up via the mask below
            cmp = (xc >= u_ref[f : f + 1, :]).astype(jnp.int32)
            ranks.append(jnp.sum(cmp, axis=1, keepdims=True))
        q = jnp.concatenate(ranks, axis=1)  # [Rt, F] int32

        xf = x[:, :F]
        nan_mask = (xf != xf).astype(jnp.int32)  # 1 where missing
        out_ref[:] = _assemble_planes(q, nan_mask, F, row_tile)

    return kernel


def rank_planes_kernel(x_canon, u_pad, *, row_tile: int = 256,
                       interpret: bool = False):
    """x_canon [R_pad, 128] f32 (NaN missing, 128-padded rows) +
    u_pad [F, K_pad] f32 (NaN-padded sorted thresholds) → int8 planes
    [R_pad, 128*G]."""
    rows = x_canon.shape[0]
    F, k_pad = u_pad.shape
    G = rank_groups(F)
    assert rows % row_tile == 0
    if F > RANK_MAX_COLS:
        raise ValueError(f"rank planes support <= {RANK_MAX_COLS} features")
    if F > LANE:
        raise ValueError(
            "flat v1 transform holds x in one vreg (<= 128 features); "
            "wide forests use the group-streamed v2 kernel"
        )

    # flat-path scoped VMEM scales with Rt * k_pad * F (per-feature compare
    # intermediates stay live): measured 100.7M real scoped OOM at
    # (Rt 2048, k_pad 128, F 120) on gisette-class, r3 sweep. Halve the
    # internal row tile until the estimate fits the budget (rows stay a
    # multiple: callers pad to row_tile, and we only halve). Budget comes
    # from TpuLimits so a cap recalibration moves this guard too (ADVICE r3
    # #4; 48 MiB at the current 64 MiB x 0.75 calibration).
    from tahoe_tpu.config import TpuLimits

    budget = TpuLimits().usable_vmem
    while row_tile > 128 and row_tile * k_pad * 4 * F > budget:
        row_tile //= 2

    out32 = pl.pallas_call(
        _make_kernel(F, k_pad, row_tile),
        grid=(rows // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, LANE), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, k_pad), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, LANE * G), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANE * G), jnp.int32),
        interpret=interpret,
        **compile_kwargs(interpret),
    )(x_canon, u_pad)
    return out32.astype(jnp.int8)


# ---------------------------------------------------------------------------
# v2: two-level bucketed rank count (for large threshold tables)
# ---------------------------------------------------------------------------
#
# rank_f(x) = #{u in U_f : u <= x}. The v1 kernel pays |U_f| compares per
# (row, feature); v2 splits each sorted table into 128 chunks of S elements:
#
#   b       = #{chunks whose max <= x}            (one [Rt,128] compare)
#   chunk_b = one_hot(b) @ digit_planes           (exact MXU select, 4 bf16
#                                                  matmuls of base-256 digits)
#   rank    = b*S + #{u in chunk_b : u <= x}      (one [Rt,S] compare)
#
# All compares happen in monotone-int32 key space (the radix-sort float trick)
# so selecting thresholds through the MXU is bit-exact: digits are ints in
# [-128, 127], exactly representable in bf16, and each one-hot matmul sums one
# nonzero product — no rounding anywhere. VPU work per (row, feature) drops
# from ~2*K/128 vector ops to ~16 regardless of K.


def _float_keys(u: np.ndarray) -> np.ndarray:
    """Monotone int32 keys: key(a) <= key(b) ⇔ a <= b for all finite/inf
    floats, with -0.0 canonicalized to +0.0 (they compare equal as floats)."""
    u = np.asarray(u, np.float32) + np.float32(0.0)
    bits = u.view(np.int32)
    return np.where(bits >= 0, bits, bits ^ np.int32(0x7FFFFFFF))


def _signed_digits(keys: np.ndarray) -> np.ndarray:
    """int32 → 4 signed base-256 digits d_k in [-128, 127] with
    key = d0 + (d1<<8) + (d2<<16) + (d3<<24) (exact, wrapping int32)."""
    v = keys.astype(np.int64)
    digs = []
    for _ in range(4):
        d = ((v + 128) % 256) - 128
        digs.append(d.astype(np.int8))
        v = (v - d) >> 8
    out = np.stack(digs, axis=0)
    # verify exact reconstruction in wrapping int32
    rec = np.zeros(keys.shape, np.int64)
    for k in range(3, -1, -1):
        rec = rec * 256 + out[k].astype(np.int64)
    assert np.array_equal(rec.astype(np.int32), keys.astype(np.int32))
    return out


def build_bucket_tables(tables, num_cols: int, digit_dtype=None):
    """Per-feature sorted thresholds → (cmax [F_pad,128] int32, digit planes
    int8 (default) or bf16, S, paired) for the v2 kernel.

    Digits are ints in [-128, 127]: exact in EITHER dtype. int8 planes run
    the one-hot digit matmuls at the MXU's int8 rate (2x bf16) with int32
    accumulation — the digit matmul is ~70% of the transform's MXU work, so
    this is the difference between the transform riding at bf16 vs int8
    roofline (r4: in-kernel int8 truncation proven on chip,
    scripts/int8_cast_probe.py — the round-1 Mosaic limitation is gone). Each feature's table is padded to
    128*S with INT32_MAX keys (never <= any finite x); S is chosen so every
    feature has at least one pad element, guaranteeing b < 128. The feature
    axis is padded to whole 30-feature plane groups (all-INT32_MAX tables →
    rank 0) so the kernel can stream one group's tables per grid step.

    When S <= 64 two features share each 128-lane digit slot (``paired``):
    planes are [F_pad/2, 256, 4*128] block matrices (rows 0-127 = even
    feature → lanes [0,64), rows 128-255 = odd feature → lanes [64,128)), so
    one matmul + one combine + one compare serve two features."""
    S = max((len(t) // 128 + 1 for t in tables), default=1)
    G = rank_groups(num_cols)
    # multi-group: pad the feature axis to whole 30-feature groups so the
    # kernel streams one group's tables per grid step (single-group forests
    # keep the exact feature count — no padded loop iterations)
    F = num_cols if G == 1 else G * RANK_GROUP_COLS
    paired = S <= LANE // 2
    Sh = LANE // 2 if paired else _round_up(S, LANE)
    keys = np.full((F, 128, Sh), np.int32(np.iinfo(np.int32).max), np.int32)
    for f, t in enumerate(tables):
        k = _float_keys(np.sort(np.asarray(t, np.float32)))
        full = np.full(128 * S, np.iinfo(np.int32).max, np.int32)
        full[: len(k)] = k
        keys[f, :, :S] = full.reshape(128, S)
    cmax = keys[:, :, S - 1].copy()  # [F, 128] last element of each chunk
    digs = _signed_digits(keys)  # [4, F, 128, Sh] int8
    # bf16 exactly represents ints in [-128, 127]; one-hot products are exact.
    # Digit planes concatenated along lanes so the kernel fetches all four
    # digits with ONE matmul; slot boundaries stay vreg-aligned.
    if paired:
        P = (F + 1) // 2
        planes = np.zeros((P, 2 * LANE, 4 * LANE), np.float32)
        for f in range(F):
            p, half = f // 2, f % 2
            r0 = half * LANE
            for k in range(4):
                planes[p, r0 : r0 + LANE,
                       k * LANE + half * Sh : k * LANE + half * Sh + Sh] = (
                    digs[k, f]
                )
    else:
        planes = np.ascontiguousarray(digs.transpose(1, 2, 0, 3)).reshape(
            F, 128, 4 * Sh
        )
    if digit_dtype is None:
        digit_dtype = jnp.int8 if INT8_TRANSFORM else jnp.bfloat16
    return jnp.asarray(cmax), jnp.asarray(planes, digit_dtype), S, paired


def _assemble_group(q, nan_mask, row_tile: int):
    """Single-group variant of _assemble_planes: int32 ranks [Rt, 30] →
    one group's plane block [Rt, 128] (used by the group-streamed kernel)."""
    qh = q // RANK_BASE
    ql = q - qh * RANK_BASE
    m128 = jnp.int32(-128)

    def seg(vals):
        return jnp.where(nan_mask != 0, m128, vals)

    tail = jnp.concatenate(
        [
            jnp.full((row_tile, 1), 127, jnp.int32),
            jnp.full((row_tile, 1), 1, jnp.int32),
            jnp.zeros((row_tile, 6), jnp.int32),
        ],
        axis=1,
    )
    return jnp.concatenate(
        [seg(qh), seg(ql), seg(-qh), seg(-ql), tail], axis=1
    )


def rank_counts_from_x(x, *, F_loc: int, S: int, Sp: int, paired: bool,
                       int8_mode: bool, schedule: str, row_tile: int,
                       cmax_row, digs_at, qw):
    """The v2 bucketed rank count, on VALUES (not refs) so both the
    standalone transform kernel and the fused traversal kernel
    (rank_kernel._make_split_kernel with fuse_transform) share ONE
    implementation of the exact two-level count.

    x [Rt, 128] f32 (NaN = missing) → (q [Rt, F_loc] int32 ranks,
    nan_mask [Rt, F_loc] int32). ``cmax_row(f)`` → [1, 128] int32 chunk
    maxima; ``digs_at(i)`` → digit-plane matrix for pair/feature i;
    ``qw`` → the _qw_weights reduction matrix."""
    INT_MAX_POS = 0x7FFFFFFF
    xz = x + jnp.float32(0.0)  # -0.0 → +0.0
    xb = jax.lax.bitcast_convert_type(xz, jnp.int32)
    xkey = jnp.where(xb >= 0, xb, xb ^ jnp.int32(INT_MAX_POS))
    # NaN keys are large-positive; masked out at the end like v1
    nan_mask = (x[:, :F_loc] != x[:, :F_loc]).astype(jnp.int32)

    # int8 mode: compares/one-hots live in int32 on the VPU (sub-32-bit
    # VPU ops are off-limits on this target) and are truncated to int8
    # ONLY at the matmul inputs, so every dot runs at the MXU's int8
    # rate with exact int32 accumulation. bf16 mode is the proven
    # fallback (digits in [-128,127] are exact either way).
    cmp_dt = jnp.int32 if int8_mode else jnp.bfloat16
    one_col = jnp.ones((row_tile, 1), cmp_dt)

    def shift_one_hot(full):
        # one_hot(b) = shift-in-1(full) - full (exactly one 1 at the
        # first non-full chunk; b < 128 is guaranteed by padding)
        return jnp.concatenate(
            [one_col, full[:, : LANE - 1]], axis=1
        ) - full

    def mm(lhs, rhs_val):
        if int8_mode:
            return jax.lax.dot_general(
                lhs.astype(jnp.int8), rhs_val,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        return jax.lax.dot_general(
            lhs, rhs_val, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def combine(m, w):
        if int8_mode:
            # int32 digit sums: key = (d0 + d1<<8) + ((d2 + d3<<8) << 16)
            # — exact in wrapping int32 (_signed_digits verifies the
            # reconstruction); matches Mosaic's int32 shift support
            p01 = m[:, :w] + (m[:, w : 2 * w] << 8)
            p23 = m[:, 2 * w : 3 * w] + (m[:, 3 * w :] << 8)
            return p01 + (p23 << 16)
        # digit slots → int32 keys: pairwise f32 combine is exact
        # (|d0 + 256*d1| < 2^17 < 2^24), then one int32 shift-add
        p01 = m[:, :w] + m[:, w : 2 * w] * jnp.float32(256.0)
        p23 = m[:, 2 * w : 3 * w] + m[:, 3 * w :] * jnp.float32(256.0)
        return p01.astype(jnp.int32) + (p23.astype(jnp.int32) << 16)

    # The per-pair chain (compare -> one-hot -> digit matmul -> combine ->
    # compare -> reduce matmul) is ~6 dependent ops; issued pair-by-pair
    # ("chain") the small matmuls serialize on their consumers and the
    # kernel runs latency-bound ~17x off the MXU roofline (measured,
    # scripts/unit_bench.py r2). "phase" reorders the SAME computation so
    # all pairs' digit matmuls issue back-to-back (no consumer between
    # them), then all combines, then all reduce matmuls — letting the MXU
    # pipeline independent ops while the VPU drains the previous phase.
    ranks = []
    if paired:
        pairs = list(range(0, F_loc, 2))

        def stage1(p):
            f0, f1 = p, min(p + 1, F_loc - 1)
            xk0 = xkey[:, f0 : f0 + 1]
            xk1 = xkey[:, f1 : f1 + 1]
            full0 = (xk0 >= cmax_row(f0)).astype(cmp_dt)
            full1 = (xk1 >= cmax_row(f1)).astype(cmp_dt)
            oh2 = jnp.concatenate(
                [shift_one_hot(full0), shift_one_hot(full1)], axis=1
            )  # [Rt, 256]
            return xk0, xk1, full0, full1, oh2

        def digit_mm(p, oh2):
            return mm(oh2, digs_at(p // 2))
            # [Rt, 4*128]: both features' digit slots

        def stage2(st, m):
            xk0, xk1, full0, full1, _ = st
            elem = combine(m, LANE)  # [Rt, 128]
            xk2 = jnp.concatenate(
                [jnp.broadcast_to(xk0, (row_tile, LANE // 2)),
                 jnp.broadcast_to(xk1, (row_tile, LANE // 2))], axis=1
            )
            pc = (xk2 >= elem).astype(cmp_dt)  # [Rt, 128]
            return jnp.concatenate([full0, full1, pc], axis=1)

        def reduce_mm(fp):
            return mm(fp, qw)
            # cols: b0, b1, part0, part1

        def emit(p, qv):
            s = jnp.int32(S) if int8_mode else jnp.float32(S)
            ranks.append(qv[:, 0:1] * s + qv[:, 2:3])
            if min(p + 1, F_loc - 1) > p:
                ranks.append(qv[:, 1:2] * s + qv[:, 3:4])

        if schedule == "phase":
            sts = [stage1(p) for p in pairs]
            ms = [digit_mm(p, st[4]) for p, st in zip(pairs, sts)]
            fps = [stage2(st, m) for st, m in zip(sts, ms)]
            qvs = [reduce_mm(fp) for fp in fps]
            for p, qv in zip(pairs, qvs):
                emit(p, qv)
        else:
            for p in pairs:
                st = stage1(p)
                emit(p, reduce_mm(stage2(st, digit_mm(p, st[4]))))
    else:
        def one_feature(f):
            xk = xkey[:, f : f + 1]  # [Rt, 1]
            full = (xk >= cmax_row(f)).astype(cmp_dt)
            return xk, full, shift_one_hot(full)

        def digit_mm_f(f, oh):
            return mm(oh, digs_at(f))  # [Rt, 4*Sp] exact digit values

        def pc_of(st, m):
            xk, full, _ = st
            elem = combine(m, Sp)
            pc = (xk >= elem).astype(cmp_dt)  # [Rt, Sp]
            return jnp.concatenate([full, pc], axis=1)

        def reduce_f(fp):
            # q = S*sum(full) + sum(pc) via one matmul
            qv = mm(fp, qw)
            # [Rt, LANE]; col 0 = sum(full) = b, col 1 = sum(pc)
            s = jnp.int32(S) if int8_mode else jnp.float32(S)
            ranks.append(qv[:, :1] * s + qv[:, 1:2])

        if schedule == "phase":
            sts = [one_feature(f) for f in range(F_loc)]
            ms = [digit_mm_f(f, st[2]) for f, st in enumerate(sts)]
            fps = [pc_of(st, m) for st, m in zip(sts, ms)]
            for fp in fps:
                reduce_f(fp)
        else:
            for f in range(F_loc):
                st = one_feature(f)
                reduce_f(pc_of(st, digit_mm_f(f, st[2])))
    q = jnp.concatenate(ranks, axis=1).astype(jnp.int32)  # [Rt, F_loc]
    return q, nan_mask


def _make_kernel_v2(F: int, S: int, Sp: int, row_tile: int, paired: bool,
                    group_mode: bool = False, schedule: str = "chain",
                    int8_mode: bool = False):
    # group mode: each grid step handles ONE 30-feature plane group whose
    # features sit in lanes [0, 30) of its x slot; tables stream per group
    F_loc = RANK_GROUP_COLS if group_mode else F

    def kernel(x_ref, cmax_ref, digs_ref, qw_ref, out_ref):
        def cmax_row(f):
            # group mode ships cmax 3-D ([G, 30, 128]) so the block's last
            # two dims match the full array (Pallas sublane constraint)
            return (cmax_ref[0, f : f + 1, :] if group_mode
                    else cmax_ref[f : f + 1, :])

        q, nan_mask = rank_counts_from_x(
            x_ref[:], F_loc=F_loc, S=S, Sp=Sp, paired=paired,
            int8_mode=int8_mode, schedule=schedule, row_tile=row_tile,
            cmax_row=cmax_row, digs_at=lambda i: digs_ref[i], qw=qw_ref[:],
        )
        if group_mode:
            planes = _assemble_group(q, nan_mask, row_tile)
        else:
            planes = _assemble_planes(q, nan_mask, F, row_tile)
        # int8 mode writes int8 planes DIRECTLY (in-kernel truncation proven
        # on chip, r4) — skips the int32 HBM round trip + XLA cast pass
        out_ref[:] = planes.astype(jnp.int8) if int8_mode else planes

    return kernel


def rank_planes_kernel_v2(x_canon, cmax, digs, S: int, paired: bool, *,
                          row_tile: int = 256, interpret: bool = False,
                          schedule: str = "phase"):
    """Bucketed rank transform: x_canon [R_pad, 128] f32 (NaN missing) +
    bucket tables (build_bucket_tables) → int8 planes [R_pad, 128*G].

    Multi-group forests stream one 30-feature plane group's tables per grid
    step (digit planes for 100+ banded features would otherwise bust scoped
    VMEM); each step writes its own 128-lane block of the output — the plane
    layout is group-major, so blocks align exactly."""
    rows = x_canon.shape[0]
    F = cmax.shape[0]
    G = rank_groups(F)
    P, rows_dig, cols_dig = digs.shape
    Sp = cols_dig // 4
    assert rows % row_tile == 0
    if F > RANK_MAX_COLS:
        raise ValueError(f"rank planes support <= {RANK_MAX_COLS} features")
    qw_rows = 3 * LANE if paired else LANE + Sp
    int8_mode = digs.dtype == jnp.int8

    if G > 1:
        FC = RANK_GROUP_COLS
        # group-local x: slot g carries features [30g, 30(g+1)) in lanes [0,30)
        xg = jnp.concatenate(
            [jnp.pad(x_canon[:, g * FC : (g + 1) * FC],
                     ((0, 0), (0, LANE - FC))) for g in range(G)],
            axis=1,
        )
        Pg = P // G  # digit planes per group (15 paired / 30 plain)
        out32 = pl.pallas_call(
            _make_kernel_v2(F, S, Sp, row_tile, paired, group_mode=True,
                            schedule=schedule, int8_mode=int8_mode),
            grid=(rows // row_tile, G),
            in_specs=[
                pl.BlockSpec((row_tile, LANE), lambda r, g: (r, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, FC, LANE), lambda r, g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Pg, rows_dig, cols_dig), lambda r, g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((qw_rows, LANE), lambda r, g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((row_tile, LANE), lambda r, g: (r, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (rows, LANE * G), jnp.int8 if int8_mode else jnp.int32),
            interpret=interpret,
            **compile_kwargs(interpret),
        )(xg, cmax.reshape(G, FC, LANE), digs, _qw_weights(Sp, paired, int8_mode))
        return out32 if int8_mode else out32.astype(jnp.int8)

    out32 = pl.pallas_call(
        _make_kernel_v2(F, S, Sp, row_tile, paired, schedule=schedule,
                        int8_mode=int8_mode),
        grid=(rows // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, LANE), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, LANE), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, rows_dig, cols_dig), lambda r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qw_rows, LANE), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, LANE * G), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (rows, LANE * G), jnp.int8 if int8_mode else jnp.int32),
        interpret=interpret,
        **compile_kwargs(interpret),
    )(x_canon, cmax, digs, _qw_weights(Sp, paired, int8_mode))
    return out32 if int8_mode else out32.astype(jnp.int8)


def _qw_weights(Sp: int, paired: bool, int8_mode: bool = False):
    """Reduction weights (bf16, or int8 in int8 mode — 0/1 values are exact
    in both). Plain: [(128+Sp), 128], col 0 sums the 128 chunk lanes (b),
    col 1 the Sp element lanes. Paired: [384, 128] with cols
    (b0, b1, part0, part1) for the (full0 | full1 | pc) concat."""
    if paired:
        qw = np.zeros((3 * LANE, LANE), np.float32)
        qw[:LANE, 0] = 1.0
        qw[LANE : 2 * LANE, 1] = 1.0
        qw[2 * LANE : 2 * LANE + LANE // 2, 2] = 1.0
        qw[2 * LANE + LANE // 2 :, 3] = 1.0
    else:
        qw = np.zeros((LANE + Sp, LANE), np.float32)
        qw[:LANE, 0] = 1.0
        qw[LANE:, 1] = 1.0
    return jnp.asarray(qw, jnp.int8 if int8_mode else jnp.bfloat16)


def pad_threshold_tables(tables, num_cols: int) -> np.ndarray:
    """Per-feature sorted thresholds → [F, K_pad] f32, NaN padded (NaN
    thresholds never count toward a rank: x >= NaN is always False)."""
    kmax = max((len(t) for t in tables), default=1)
    k_pad = _round_up(max(kmax, 1), LANE)
    out = np.full((num_cols, k_pad), np.nan, np.float32)
    for f, t in enumerate(tables):
        out[f, : len(t)] = t
    return out


class RankTransformer:
    """Standalone rank transform: raw f32 rows → int8 plane vectors.

    Factors the transform half of RankFoldEngine (quantization tables +
    canonicalize + fused Pallas transform) so engines that are NOT the dense
    rank kernel (the sparse rank-descent engine, ops/sparse_kernel.py) can
    share one exact transform without building dense per-level matrices.

    ``q`` is the RankQuantizedForest AFTER band_split; ``vf_base`` the
    composed data-column gather (compaction + band expansion) or None;
    ``raw_missing`` the ORIGINAL forest sentinel (band splitting replaces the
    rank-domain spec's sentinel with NaN but raw rows still carry the
    original).
    """

    def __init__(self, q, vf_base, raw_missing: float):
        self.q = q
        self.vf_base = vf_base
        self.raw_missing = raw_missing
        self.num_cols = q.spec.num_cols
        u_pad = pad_threshold_tables(q.tables, self.num_cols)
        # v2 for big tables and for > 128 virtual features (v1's x is one
        # vreg; v2's group-streamed grid handles any width — r5)
        self.v2 = u_pad.shape[1] > 256 or self.num_cols > LANE
        if self.v2:
            cmax, digs, self.bucket_s, self.bucket_paired = (
                build_bucket_tables(q.tables, self.num_cols)
            )
            self.rank_tables = (cmax, digs)
        else:
            self.rank_tables = (jnp.asarray(u_pad),)

    def canonicalize(self, data, row_tile: int):
        """f32 rows → NaN-missing, virtual-feature-expanded, 128-lane-padded,
        row_tile-padded (mirrors RankFoldEngine._canonicalize)."""
        from tahoe_tpu.config import MISSING_EPS

        x = data.astype(jnp.float32)
        missing = self.raw_missing
        if np.isnan(np.float32(missing)):
            miss = jnp.isnan(x)
        else:
            miss = jnp.abs(x - jnp.float32(missing)) <= jnp.float32(MISSING_EPS)
        x = jnp.where(miss, jnp.float32(np.nan), x)
        if self.vf_base is not None:
            x = x[:, self.vf_base]
        from tahoe_tpu.ops.rank_kernel import _x_lanes

        x = jnp.pad(x, ((0, (-x.shape[0]) % row_tile),
                        (0, _x_lanes(x.shape[1]) - x.shape[1])))
        return x

    def transform(self, rank_tables, data, *, row_tile: int,
                  interpret: bool = False, schedule: str = "phase"):
        """Rows → int8 planes [R_pad, 128*G]; pass ``self.rank_tables`` (or a
        device-placed copy) as ``rank_tables`` so jit callers keep tables as
        arguments (closure-captured device arrays re-ship per call)."""
        x = self.canonicalize(data, row_tile)
        if self.v2:
            cmax, digs = rank_tables
            return rank_planes_kernel_v2(
                x, cmax, digs, self.bucket_s, self.bucket_paired,
                row_tile=row_tile, interpret=interpret, schedule=schedule,
            )
        return rank_planes_kernel(x, rank_tables[0], row_tile=row_tile,
                                  interpret=interpret)
