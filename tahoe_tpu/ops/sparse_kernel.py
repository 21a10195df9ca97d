"""Pallas sparse rank-descent: CSR traversal priced by TRUE node count.

The dense engines pay 2^D work per tree no matter how sparse the tree is
(complete-tree storage, Struct.h:19-21); real trained ensembles at depth
14-20 are ~80% filler, and beyond depth ~15 every dense strategy is
infeasible outright. This kernel is the TPU rendition of the reference's
dormant ``sparse_forest`` path (Struct.h:2217-2353, ``infer_sparse``
left+cond descent at 2244) designed for how a TPU actually wants to run it:

- **Conditions come off the MXU, not from gathers.** Every live node's
  branch rule is one int8 rank-matrix column (the same exact encoding as the
  dense rank kernel, compiler.rank_normalize): diff = planes @ col, cond =
  diff >= 0 — missing/def_left/exchange compiled in. No per-row feature
  gather exists in the kernel at all.
- **Descent is a select-chain over COMPACTED levels.** Each tree's level-l
  live nodes are packed to local indices; 128 trees ride the lanes
  (column = node_local * 128 + tree_lane). Advancing a level costs
  W_l selects of full [row_tile, 128] vregs — W_l is the PRUNED width
  (≤ #leaves), not 2^l. Early leaves accumulate their value once and park
  on a per-level dead node (index 0: passthrough column, child 0, value 0).
- Child pairs are stored adjacent (``next = child + cond``, the CSR step);
  when a node's missing-direction lands right, its pair is stored swapped
  and the column's comparison sense flips (pos <-> neg form) so that the
  matrix's 0-on-missing always walks to the stored-left slot — exactly the
  ge-normalization trick applied to CSR.

Exactness: rank quantization makes int8 exact (quantize.py); band_split
covers >16255-threshold features; parity is asserted against the CPU oracle
like every other engine.
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tahoe_tpu.config import TpuLimits
from tahoe_tpu.forest.compiler import (
    RANK_BASE,
    RANK_GROUP_COLS,
    RANK_LANE_C1,
    RANK_LANE_C127,
    RANK_LANE_NQH,
    RANK_LANE_NQL,
    RANK_LANE_QH,
    RANK_LANE_QL,
    RANK_MAX,
    RANK_MAX_COLS,
    rank_groups,
)
from tahoe_tpu.forest.quantize import (
    band_split,
    quantize,
    quantized_spec_for_engines,
)
from tahoe_tpu.forest.spec import ForestSpec
from tahoe_tpu.ops.fold_kernel import LANE, _cdiv, _round_up
from tahoe_tpu.ops.mosaic import compile_kwargs
from tahoe_tpu.ops.transform import apply_output_transform

# compile-size guard: the kernel unrolls ~5 vector statements per node slot;
# beyond this the Mosaic compile becomes the risk (deep fold kernels hang
# past ~16k statements — CLAUDE.md, measured round 1)
MAX_POOL_SLOTS = 2048


class SparseLeveled(NamedTuple):
    """Per-level packed sparse forest for the descent kernel.

    widths[l] = padded per-tree slot count of level l (slot 0 = dead node).
    mats      int8 [128G, n_tiles * summat * 128]  (levels 0..L-1 concat,
              column = ((tile, level offset + slot) * 128 + tree_lane))
    child     int32 [n_tiles * sumw, 128]  (levels 0..L-1 then level L zeros)
    val       f32  [n_tiles * sumw, 128]  (levels 0..L)
    roots     int32 [n_tiles, 128]
    """

    widths: Tuple[int, ...]
    mats: np.ndarray
    child: np.ndarray
    val: np.ndarray
    roots: np.ndarray
    n_tiles: int
    groups: int


def _node_column(m, col, rank, fid, neg, G):
    """Write one rank-matrix column (compiler.rank_normalize's encoding)."""
    rh, rl = rank // RANK_BASE, rank % RANK_BASE
    grp = 128 * (fid // RANK_GROUP_COLS)
    off = fid % RANK_GROUP_COLS
    if neg:
        m[grp + RANK_LANE_NQH + off, col] = RANK_BASE
        m[grp + RANK_LANE_NQL + off, col] = 1
        m[RANK_LANE_C127, col] = rh
        m[RANK_LANE_C1, col] = rl - 1
    else:
        m[grp + RANK_LANE_QH + off, col] = RANK_BASE
        m[grp + RANK_LANE_QL + off, col] = 1
        m[RANK_LANE_C127, col] = -rh
        m[RANK_LANE_C1, col] = -rl


def build_sparse_leveled(sf, G: int) -> SparseLeveled:
    """SparseForest (rank-domain: internal values = integer ranks) → packed
    per-level arrays. ``sf`` comes from sparse.from_dense of the quantized
    spec, so def_left/exchange are live and thresholds are exact ranks."""
    T = sf.num_trees
    n_tiles = _cdiv(max(T, 1), LANE)
    Tp = n_tiles * LANE
    L = sf.max_depth

    # node depths + per-level per-tree node lists (pool is BFS per tree)
    depth = np.zeros(sf.num_nodes, np.int32)
    per_level: List[List[List[int]]] = [
        [[] for _ in range(Tp)] for _ in range(L + 1)
    ]
    bounds = list(sf.tree_roots) + [sf.num_nodes]
    for t in range(T):
        for n in range(bounds[t], bounds[t + 1]):
            d = depth[n]
            per_level[d][t].append(n)
            if not sf.is_leaf[n]:
                li = sf.left_idx[n]
                depth[li] = d + 1
                depth[li + 1] = d + 1

    widths = tuple(
        1 + max((len(per_level[l][t]) for t in range(Tp)), default=0)
        for l in range(L + 1)
    )
    sumw = sum(widths)
    summat = sum(widths[:-1]) if L > 0 else 0

    mats = np.zeros((128 * G, n_tiles, summat, LANE), np.int8)
    child = np.zeros((n_tiles, sumw, LANE), np.int32)
    val = np.zeros((n_tiles, sumw, LANE), np.float32)
    roots = np.zeros((n_tiles, LANE), np.int32)

    moff = np.concatenate([[0], np.cumsum(widths[:-1])]).astype(int)
    # every slot defaults to the dead/passthrough column: cond = 0
    mats[RANK_LANE_C1] = -1

    # local slot assignment: children of level-l internals get consecutive
    # slots in level l+1, starting at 1 (slot 0 = dead)
    slot = np.full(sf.num_nodes, -1, np.int64)
    next_free = [[1] * Tp for _ in range(L + 1)]
    for t in range(T):
        if per_level[0][t]:
            slot[per_level[0][t][0]] = 1
            next_free[0][t] = 2
            roots[t // LANE, t % LANE] = 1

    ranks = sf.values  # f32 integer ranks at internal nodes
    for l in range(L + 1):
        for t in range(T):
            tile, lane = t // LANE, t % LANE
            for n in per_level[l][t]:
                s = int(slot[n])
                assert s >= 1
                if sf.is_leaf[n]:
                    val[tile, moff[l] + s, lane] = sf.values[n]
                    # child stays 0 (dead), column stays passthrough
                    continue
                r = int(ranks[n])
                if not (0 <= r <= RANK_MAX):
                    raise ValueError(f"rank {r} out of int8 MXU range")
                dl = bool(sf.def_left[n])
                ex = bool(sf.exchange[n])
                swapped = (not dl) ^ ex  # cond value on missing rows
                neg = ex ^ swapped
                col = (moff[l] + s) * LANE + lane
                _node_column(mats[:, tile].reshape(128 * G, -1), col,
                             r, int(sf.fids[n]), neg, G)
                c = next_free[l + 1][t]
                next_free[l + 1][t] = c + 2
                li = sf.left_idx[n]
                if swapped:
                    slot[li + 1], slot[li] = c, c + 1
                else:
                    slot[li], slot[li + 1] = c, c + 1
                child[tile, moff[l] + s, lane] = c

    # level L val offsets: loop above indexed val at sum(widths[:l]) + s for
    # l == L and moff[l] + s otherwise; moff[L] would be summat == sum[:L],
    # so both forms agree — keep the arrays flat
    return SparseLeveled(
        widths=widths,
        mats=np.ascontiguousarray(mats.reshape(128 * G, -1)),
        child=np.ascontiguousarray(child.reshape(-1, LANE)),
        val=np.ascontiguousarray(val.reshape(-1, LANE)),
        roots=roots,
        n_tiles=n_tiles,
        groups=G,
    )


def _make_sparse_kernel(widths, G: int, Rt: int, col_chunk: int = 512):
    L = len(widths) - 1
    moff = [0]
    for w in widths[:-1]:
        moff.append(moff[-1] + w)

    def kernel(p_ref, mats_ref, child_ref, val_ref, roots_ref, out_ref):
        planes = p_ref[:]  # [Rt, 128G] int8

        idx = jnp.broadcast_to(roots_ref[0:1, :], (Rt, LANE))
        acc = jnp.zeros((Rt, LANE), jnp.float32)
        for l in range(L + 1):
            W = widths[l]
            nxt = jnp.zeros((Rt, LANE), jnp.int32)
            # chunked conds: CH columns of this level's matrices at a time
            ch_slots = max(1, col_chunk // LANE)
            for c0 in range(1, W, ch_slots):  # slot 0 = dead, cond unused
                cw = min(ch_slots, W - c0)
                if l < L:
                    d = jax.lax.dot_general(
                        planes,
                        mats_ref[:, (moff[l] + c0) * LANE
                                 : (moff[l] + c0 + cw) * LANE],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    conds = d >= 0
                for j in range(cw):
                    i = c0 + j
                    sel = idx == i
                    vrow = jnp.broadcast_to(
                        val_ref[moff[l] + i : moff[l] + i + 1, :], (Rt, LANE))
                    acc = acc + jnp.where(sel, vrow, jnp.float32(0.0))
                    if l < L:
                        crow = jnp.broadcast_to(
                            child_ref[moff[l] + i : moff[l] + i + 1, :],
                            (Rt, LANE))
                        cand = crow + conds[:, j * LANE : (j + 1) * LANE
                                            ].astype(jnp.int32)
                        nxt = jnp.where(sel, cand, nxt)
            idx = nxt

        out_ref[0] = jnp.sum(acc, axis=1, keepdims=True)

    return kernel


def sparse_rank_margins(lv: SparseLeveled, tables, planes_pad, Rt: int,
                        interpret: bool, col_chunk: int = 512):
    rows = planes_pad.shape[0]
    G = lv.groups
    sumw = sum(lv.widths)
    summat = sum(lv.widths[:-1])
    grid = (lv.n_tiles, rows // Rt)  # rows innermost: tables stream once
    in_specs = [
        pl.BlockSpec((Rt, LANE * G), lambda t, r: (r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((LANE * G, summat * LANE), lambda t, r: (0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((sumw, LANE), lambda t, r: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((sumw, LANE), lambda t, r: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANE), lambda t, r: (t, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, Rt, 1), lambda t, r: (t, r, 0),
                            memory_space=pltpu.VMEM)
    partials = pl.pallas_call(
        _make_sparse_kernel(lv.widths, G, Rt, col_chunk),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((lv.n_tiles, rows, 1), jnp.float32),
        interpret=interpret,
        **compile_kwargs(interpret),
    )(planes_pad, *tables)
    return jnp.sum(partials[:, :, 0], axis=0)


class SparseRankEngine:
    """Rank-quantized CSR descent engine (Strategy.SPARSE's fast tier).

    Shares the exact rank transform with the dense rank engine
    (rank_transform.RankTransformer) but its matrices cover only LIVE nodes:
    work and memory scale with the pruned pool, so depth-16+ trained
    ensembles run where every dense form is infeasible."""

    def __init__(self, forest: ForestSpec, *, row_tile: int = 256,
                 interpret: bool = False, band: int | None = None,
                 col_chunk: int = 512, limits: TpuLimits = TpuLimits()):
        from tahoe_tpu.forest import sparse as sp
        from tahoe_tpu.forest.compiler import (
            compact_features,
            reachable_depths,
            truncate_depth,
        )
        from tahoe_tpu.ops.rank_transform import RankTransformer

        raw_missing = forest.missing
        forest = truncate_depth(
            forest, int(reachable_depths(forest).max(initial=0))
        )
        forest, col_index = compact_features(forest)
        if forest.num_cols > RANK_MAX_COLS:
            raise NotImplementedError(
                f"sparse rank kernel supports <= {RANK_MAX_COLS} live "
                f"features; got {forest.num_cols}"
            )
        q = quantize(forest)
        q, vf_base = band_split(q, band)
        if col_index is None:
            base = vf_base
        elif vf_base is None:
            base = col_index
        else:
            base = col_index[vf_base]
        if q.spec.num_cols > RANK_MAX_COLS:
            raise NotImplementedError(
                f"banded forest needs {q.spec.num_cols} virtual features "
                f"> {RANK_MAX_COLS}"
            )
        self.tf = RankTransformer(q, base, raw_missing)
        self.groups = rank_groups(q.spec.num_cols)

        sf = sp.from_dense(quantized_spec_for_engines(q))
        self.lv = build_sparse_leveled(sf, self.groups)
        pool = sum(self.lv.widths)
        if pool > MAX_POOL_SLOTS:
            raise NotImplementedError(
                f"sparse pool {pool} slots > {MAX_POOL_SLOTS} "
                f"(compile-size guard)"
            )
        need = self.vmem_bytes(self.lv, row_tile, col_chunk)
        if not interpret and need > limits.usable_vmem:
            raise ValueError(
                f"sparse tile needs ~{need/2**20:.1f} MiB VMEM > "
                f"{limits.usable_vmem/2**20:.1f} MiB"
            )

        self.num_trees = sf.num_trees
        self.output = sf.output
        self.global_bias = sf.global_bias
        self.threshold = sf.threshold
        self.row_tile = row_tile
        self.col_chunk = col_chunk
        self.interpret = interpret
        self.tables = (
            jnp.asarray(self.lv.mats),
            jnp.asarray(self.lv.child),
            jnp.asarray(self.lv.val),
            jnp.asarray(self.lv.roots),
        )
        self.rank_tables = self.tf.rank_tables
        self._predict = jax.jit(self._predict_impl)
        self._predict_k = jax.jit(self._chain_impl, static_argnames=("k",))

    # ------------------------------------------------------------------
    @staticmethod
    def vmem_bytes(lv: SparseLeveled, row_tile: int,
                   col_chunk: int = 512) -> int:
        summat = sum(lv.widths[:-1])
        sumw = sum(lv.widths)
        dbuf = 2 if lv.n_tiles > 1 else 1
        mats = dbuf * 128 * lv.groups * summat * LANE
        tabs = dbuf * 2 * sumw * LANE * 4
        live = row_tile * LANE * (4 + 4 + 4)  # idx + acc + nxt
        chunk = row_tile * col_chunk * 4
        planes = row_tile * LANE * lv.groups
        return int(mats + tabs + live + chunk + planes * 2)

    @classmethod
    def feasible(cls, forest: ForestSpec,
                 limits: TpuLimits = TpuLimits()) -> str | None:
        """Cheap pre-check (no quantization): live-feature and pool caps."""
        from tahoe_tpu.engine.feasibility import rank_virtual_cols
        from tahoe_tpu.forest.compiler import reachable_mask

        vcols = rank_virtual_cols(forest)
        if vcols > RANK_MAX_COLS:
            return f"{vcols} virtual features > {RANK_MAX_COLS}"
        # slot pool ~ per-level max widths; bound by reachable nodes / trees
        pool = int(reachable_mask(forest).sum())
        per_tree = pool / max(forest.num_trees, 1)
        est_slots = int(per_tree * 1.6) + forest.depth + 1
        if est_slots > MAX_POOL_SLOTS:
            return (f"~{est_slots} level slots > {MAX_POOL_SLOTS} "
                    f"(compile-size guard)")
        return None

    # ------------------------------------------------------------------
    def _margins(self, tables, planes):
        rows = planes.shape[0]
        pad = (-rows) % self.row_tile
        if pad:
            planes = jnp.concatenate(
                [planes, jnp.zeros((pad, planes.shape[1]), planes.dtype)],
                axis=0,
            )
        return sparse_rank_margins(self.lv, tables, planes, self.row_tile,
                                   self.interpret, self.col_chunk)[:rows]

    def _predict_impl(self, tables, rank_tables, data):
        rows = data.shape[0]
        planes = self.tf.transform(rank_tables, data, row_tile=self.row_tile,
                                   interpret=self.interpret)
        margins = self._margins(tables, planes)[:rows]
        return apply_output_transform(
            margins, self.num_trees, self.output, self.global_bias,
            self.threshold, jnp,
        )

    def _chain_impl(self, tables, rank_tables, data, k):
        def body(_, acc):
            return self._predict_impl(tables, rank_tables, data + acc[0] * 0.0)

        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros(data.shape[0], jnp.float32))

    # ------------------------------------------------------------------
    def predict(self, data) -> jax.Array:
        return self._predict(self.tables, self.rank_tables, jnp.asarray(data))

    def predict_k(self, data, k: int) -> jax.Array:
        return self._predict_k(self.tables, self.rank_tables,
                               jnp.asarray(data), k=k)
