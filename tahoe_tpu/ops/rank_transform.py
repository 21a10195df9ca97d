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


def pad_threshold_tables(tables, num_cols: int) -> np.ndarray:
    """Per-feature sorted thresholds → [F, K_pad] f32, NaN padded (NaN
    thresholds never count toward a rank: x >= NaN is always False)."""
    kmax = max((len(t) for t in tables), default=1)
    k_pad = _round_up(max(kmax, 1), LANE)
    out = np.full((num_cols, k_pad), np.nan, np.float32)
    for f, t in enumerate(tables):
        out[f, : len(t)] = t
    return out
