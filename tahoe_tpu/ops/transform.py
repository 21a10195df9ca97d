"""Output transform: margin → prediction.

Semantics of the reference's transform_k kernel (Struct.h:196-209) and CPU
oracle tail (BaseTahoeTest.h:465-472), applied in this exact order:
AVG (divide by num_trees) → + global_bias → SIGMOID → THRESHOLD (strictly
greater-than → 1.0 else 0.0). Works on numpy or jax.numpy arrays.
"""
from __future__ import annotations

import numpy as np

from tahoe_tpu.config import Output


def apply_output_transform(margins, num_trees: int, output: int,
                           global_bias: float, threshold: float, xp=np):
    """Apply the output transform with the array module ``xp`` (numpy or jnp)."""
    preds = margins
    dtype = preds.dtype
    if output & Output.AVG:
        preds = preds / np.float32(num_trees)
    if global_bias != 0.0:
        preds = preds + np.float32(global_bias)
    if output & Output.SIGMOID:
        preds = 1.0 / (1.0 + xp.exp(-preds))
    if output & Output.THRESHOLD:
        preds = xp.where(preds > np.float32(threshold), np.float32(1.0), np.float32(0.0))
    return preds.astype(dtype)
