"""INT8/INT16 rank quantization of node tables — exact decision parity.

The north-star's "weight-only quantization of node tables": thresholds and
feature values are replaced by small integers while predictions stay
bit-identical to the float engine. The trick is that tree traversal never does
arithmetic on features — only ``x >= thresh`` comparisons (Struct.h:383) — so
any *order-preserving* remapping of (feature values, thresholds) preserves
every routing decision exactly:

  For each feature f, collect the sorted unique thresholds U_f used by any
  node splitting on f. Define
      rank_f(x)      = #{u in U_f : u <= x}     (searchsorted right)
      rank_f(theta)  = index of theta in U_f + 1
  Then  x >= theta  ⇔  rank_f(x) >= rank_f(theta),  exactly, for all finite
  x (ties included, because theta ∈ U_f).

Node tables shrink to int8 when every feature has ≤ 254 distinct thresholds
(hist-trained GBDTs: ≤ 256 bins) and int16 otherwise — the same adaptive-width
spirit as the reference's char/short/int fid packing (Struct.h:1827-1852).
Features are transformed once per batch (a fused searchsorted on device or
numpy on host); missing values keep their sentinel semantics by being mapped
to rank 0 with the routing handled by the engines' missing path (rank 0 is
below every threshold rank ≥ 1, so ``cond`` is False exactly like a NaN
compare — engines then apply def_right routing through their usual mask).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from tahoe_tpu.config import MISSING_EPS
from tahoe_tpu.forest.spec import ForestSpec


@dataclasses.dataclass
class RankQuantizedForest:
    """ForestSpec with values replaced by threshold ranks (internal nodes).

    - ``spec`` — a ForestSpec whose internal-node ``values`` hold f32-encoded
      integer ranks (exact: ranks ≤ 2^24); leaf values stay true f32.
    - ``tables`` — per-feature sorted unique thresholds (for transforming x).
    - ``width`` — 1 (int8-representable ranks) or 2 (int16).
    """

    spec: ForestSpec
    tables: List[np.ndarray]
    width: int

    @property
    def max_ranks(self) -> int:
        return max((len(t) for t in self.tables), default=0)


def quantize(forest: ForestSpec) -> RankQuantizedForest:
    """Build the rank-domain forest (thresholds → ranks, exact)."""
    F = forest.num_cols
    internal = ~forest.is_leaf
    tables: List[np.ndarray] = []
    for f in range(F):
        mask = internal & (forest.fids == f)
        thr = np.unique(forest.values[mask]) if mask.any() else np.empty(0, np.float32)
        tables.append(thr.astype(np.float32))

    spec = forest.copy()
    for f in range(F):
        mask = internal & (forest.fids == f)
        if not mask.any():
            continue
        ranks = np.searchsorted(tables[f], forest.values[mask], side="right")
        # theta ∈ U_f ⇒ rank(theta) = index+1 = searchsorted right ✓
        spec.values[mask] = ranks.astype(np.float32)
    width = 1 if max((len(t) for t in tables), default=0) <= 254 else 2
    return RankQuantizedForest(spec=spec, tables=tables, width=width)


def transform_rows_np(q: RankQuantizedForest, data: np.ndarray) -> np.ndarray:
    """Features → ranks (f32-encoded ints; missing → NaN) on the host.

    Missing inputs (NaN or sentinel per the forest) become NaN so the engines'
    missing path fires exactly as in the float domain.
    """
    data = np.asarray(data, np.float32)
    missing = q.spec.missing
    if np.isnan(np.float32(missing)):
        miss = np.isnan(data)
    else:
        miss = np.abs(data - np.float32(missing)) <= np.float32(MISSING_EPS)
    out = np.empty_like(data)
    for f in range(data.shape[1]):
        out[:, f] = np.searchsorted(q.tables[f], data[:, f], side="right")
    out[miss] = np.nan
    # the engines' finite-sentinel detection must NOT re-fire on rank values:
    # ranks are >= 0, so any finite sentinel is safe once we use NaN here
    return out


def transform_rows_device(q: RankQuantizedForest, data):
    """Device-side rank transform: one fused compare-accumulate per feature.

    rank_f(x) = sum_j (x >= U_f[j]) — exact, vectorized, no gathers; cost is
    sum_f |U_f| compares per row, which is bounded by the forest's internal
    node count. Padded to the max table size with +inf (contributes 0).
    """
    import jax.numpy as jnp

    data = jnp.asarray(data, jnp.float32)
    missing = q.spec.missing
    if np.isnan(np.float32(missing)):
        miss = jnp.isnan(data)
    else:
        miss = jnp.abs(data - jnp.float32(missing)) <= jnp.float32(MISSING_EPS)

    kmax = max(q.max_ranks, 1)
    padded = np.full((len(q.tables), kmax), np.inf, np.float32)
    for f, t in enumerate(q.tables):
        padded[f, : len(t)] = t
    u = jnp.asarray(padded)  # [F, K]
    # ranks[r, f] = sum_j x[r, f] >= u[f, j]
    ranks = (data[:, :, None] >= u[None, :, :]).sum(axis=2).astype(jnp.float32)
    return jnp.where(miss, jnp.float32(np.nan), ranks)


def quantized_spec_for_engines(q: RankQuantizedForest) -> ForestSpec:
    """The rank-domain ForestSpec ready for any engine: missing sentinel is
    forced to NaN (transform_rows_* emits NaN for missing)."""
    spec = q.spec.copy()
    spec.missing = float("nan")
    return spec
