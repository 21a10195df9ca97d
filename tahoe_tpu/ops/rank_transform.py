"""Fused Pallas rank-transform: f32 rows → int8 rank planes in one pass.

The rank transform (rank_f(x) = #{u in U_f : u <= x}, quantize.py) is the
per-batch preprocessing of the rank-MXU engine. Its naive XLA form
materializes the [rows, F, K] compare tensor through HBM (~0.30 us/row for
SUSY-scale threshold counts); this kernel keeps the whole thing in VMEM:
per row tile, for each feature, one broadcast compare of the row's value
against the feature's sorted threshold row and a lane reduction, then the
base-127 plane encoding (quantize.encode_rank_planes_*) emitted directly.

Output is int32 plane vectors (Mosaic on this target cannot truncate to int8
in-kernel); the caller casts to int8 in XLA, which is a single cheap
elementwise pass.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tahoe_tpu.forest.compiler import (
    RANK_BASE,
    RANK_LANE_C1,
    RANK_LANE_C127,
    RANK_LANE_NQH,
    RANK_LANE_NQL,
    RANK_LANE_QH,
    RANK_LANE_QL,
)
from tahoe_tpu.ops.fold_kernel import LANE, _round_up


def _make_kernel(F: int, k_pad: int, row_tile: int):
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

        qh = q // RANK_BASE
        ql = q - qh * RANK_BASE
        m128 = jnp.int32(-128)

        def seg(vals):
            return jnp.where(nan_mask != 0, m128, vals)

        # lane map must match compiler.rank_normalize: 30-lane plane slots
        # [0,30) qh | [30,60) ql | [60,90) -qh | [90,120) -ql | 120:127 121:1
        parts = []
        z30 = jnp.zeros((row_tile, 30 - F), jnp.int32) if F < 30 else None
        for plane in (seg(qh), seg(ql), seg(-qh), seg(-ql)):
            parts.append(plane)
            if z30 is not None:
                parts.append(z30)
        tail = jnp.concatenate(
            [
                jnp.full((row_tile, 1), 127, jnp.int32),
                jnp.full((row_tile, 1), 1, jnp.int32),
                jnp.zeros((row_tile, 6), jnp.int32),
            ],
            axis=1,
        )
        out_ref[:] = jnp.concatenate(parts + [tail], axis=1)

    return kernel


def rank_planes_kernel(x_canon, u_pad, *, row_tile: int = 256,
                       interpret: bool = False):
    """x_canon [R_pad, 128] f32 (NaN missing, 128-padded rows) +
    u_pad [F, K_pad] f32 (NaN-padded sorted thresholds) → int8 planes
    [R_pad, 128]."""
    rows = x_canon.shape[0]
    F, k_pad = u_pad.shape
    assert rows % row_tile == 0
    if F > 30:
        raise ValueError("rank planes support <= 30 features")

    out32 = pl.pallas_call(
        _make_kernel(F, k_pad, row_tile),
        grid=(rows // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, LANE), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, k_pad), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, LANE), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.int32),
        interpret=interpret,
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


def build_bucket_tables(tables, num_cols: int):
    """Per-feature sorted thresholds → (cmax [F,128] int32,
    digits [F,4,128,Sp] bf16, S) for the v2 kernel. Each feature's table is
    padded to 128*S with INT32_MAX keys (never <= any finite x); S is chosen
    so every feature has at least one pad element, guaranteeing b < 128."""
    S = max((len(t) // 128 + 1 for t in tables), default=1)
    Sp = _round_up(S, LANE)
    F = num_cols
    keys = np.full((F, 128, Sp), np.int32(np.iinfo(np.int32).max), np.int32)
    for f, t in enumerate(tables):
        k = _float_keys(np.sort(np.asarray(t, np.float32)))
        full = np.full(128 * S, np.iinfo(np.int32).max, np.int32)
        full[: len(k)] = k
        keys[f, :, :S] = full.reshape(128, S)
    cmax = keys[:, :, S - 1].copy()  # [F, 128] last element of each chunk
    digs = _signed_digits(keys)  # [4, F, 128, Sp] int8
    # bf16 exactly represents ints in [-128, 127]; one-hot products are exact.
    # Digit planes concatenated along lanes ([F, 128, 4*Sp]) so the kernel
    # fetches all four digits with ONE matmul; Sp is a 128-multiple so the
    # per-digit slices stay vreg-aligned.
    digs_bf = jnp.asarray(
        np.ascontiguousarray(digs.transpose(1, 2, 0, 3)).reshape(
            num_cols, 128, 4 * Sp
        ),
        jnp.bfloat16,
    )
    return jnp.asarray(cmax), digs_bf, S


def _make_kernel_v2(F: int, S: int, Sp: int, row_tile: int):
    INT_MAX_POS = 0x7FFFFFFF

    def kernel(x_ref, cmax_ref, digs_ref, qw_ref, out_ref):
        x = x_ref[:]  # [Rt, 128] f32, missing canonicalized to NaN
        xz = x + jnp.float32(0.0)  # -0.0 → +0.0
        xb = jax.lax.bitcast_convert_type(xz, jnp.int32)
        xkey = jnp.where(xb >= 0, xb, xb ^ jnp.int32(INT_MAX_POS))
        # NaN keys are large-positive; masked out at the end like v1
        nan_mask = (x[:, :F] != x[:, :F]).astype(jnp.int32)

        one_col = jnp.ones((row_tile, 1), jnp.bfloat16)

        ranks = []
        for f in range(F):
            xk = xkey[:, f : f + 1]  # [Rt, 1]
            full = (xk >= cmax_ref[f : f + 1, :]).astype(jnp.bfloat16)
            # one_hot(b) = shift-in-1(full) - full (exactly one 1 at the
            # first non-full chunk; b < 128 is guaranteed by padding)
            oh = jnp.concatenate([one_col, full[:, : LANE - 1]], axis=1) - full
            m = jax.lax.dot_general(
                oh, digs_ref[f],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Rt, 4*Sp] exact digit values
            # pairwise f32 combine (|d0 + 256*d1| < 2^17, exact in f32),
            # then one int32 shift-add
            p01 = m[:, :Sp] + m[:, Sp : 2 * Sp] * jnp.float32(256.0)
            p23 = m[:, 2 * Sp : 3 * Sp] + m[:, 3 * Sp :] * jnp.float32(256.0)
            elem = p01.astype(jnp.int32) + (p23.astype(jnp.int32) << 16)
            pc = (xk >= elem).astype(jnp.bfloat16)  # [Rt, Sp]
            # q = S*sum(full) + sum(pc) via one matmul (col 0 of qw holds
            # S for the chunk lanes and 1 for the element lanes)
            qv = jax.lax.dot_general(
                jnp.concatenate([full, pc], axis=1), qw_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Rt, LANE]; col 0 = sum(full) = b, col 1 = sum(pc)
            ranks.append(qv[:, :1] * jnp.float32(S) + qv[:, 1:2])
        q = jnp.concatenate(ranks, axis=1).astype(jnp.int32)  # [Rt, F]

        qh = q // RANK_BASE
        ql = q - qh * RANK_BASE
        m128 = jnp.int32(-128)

        def seg(vals):
            return jnp.where(nan_mask != 0, m128, vals)

        parts = []
        z30 = jnp.zeros((row_tile, 30 - F), jnp.int32) if F < 30 else None
        for plane in (seg(qh), seg(ql), seg(-qh), seg(-ql)):
            parts.append(plane)
            if z30 is not None:
                parts.append(z30)
        tail = jnp.concatenate(
            [
                jnp.full((row_tile, 1), 127, jnp.int32),
                jnp.full((row_tile, 1), 1, jnp.int32),
                jnp.zeros((row_tile, 6), jnp.int32),
            ],
            axis=1,
        )
        out_ref[:] = jnp.concatenate(parts + [tail], axis=1)

    return kernel


def rank_planes_kernel_v2(x_canon, cmax, digs, S: int, *, row_tile: int = 256,
                          interpret: bool = False):
    """Bucketed rank transform: x_canon [R_pad, 128] f32 (NaN missing) +
    bucket tables (build_bucket_tables) → int8 planes [R_pad, 128]."""
    rows = x_canon.shape[0]
    F = cmax.shape[0]
    Sp = digs.shape[-1] // 4
    assert rows % row_tile == 0
    if F > 30:
        raise ValueError("rank planes support <= 30 features")

    out32 = pl.pallas_call(
        _make_kernel_v2(F, S, Sp, row_tile),
        grid=(rows // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, LANE), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, LANE), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, LANE, 4 * Sp), lambda r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE + Sp, LANE), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, LANE), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.int32),
        interpret=interpret,
    )(x_canon, cmax, digs, _qw_weights(Sp))
    return out32.astype(jnp.int8)


def _qw_weights(Sp: int):
    """[(128+Sp), 128] bf16 reduction weights: col 0 sums the 128 chunk
    lanes (b), col 1 sums the Sp element lanes (partial count)."""
    qw = np.zeros((LANE + Sp, LANE), np.float32)
    qw[:LANE, 0] = 1.0
    qw[LANE:, 1] = 1.0
    return jnp.asarray(qw, jnp.bfloat16)


def pad_threshold_tables(tables, num_cols: int) -> np.ndarray:
    """Per-feature sorted thresholds → [F, K_pad] f32, NaN padded (NaN
    thresholds never count toward a rank: x >= NaN is always False)."""
    kmax = max((len(t) for t in tables), default=1)
    k_pad = _round_up(max(kmax, 1), LANE)
    out = np.full((num_cols, k_pad), np.nan, np.float32)
    for f, t in enumerate(tables):
        out[f, : len(t)] = t
    return out
