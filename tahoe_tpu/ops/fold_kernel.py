"""Fused Pallas select-fold traversal kernel — the performance core.

This kernel is the TPU-native realization of the reference's VMEM-resident
strategies. One grid cell = (row tile × tree tile); the tile's node tables
live in VMEM for the whole traversal and margins accumulate across tree tiles
— structurally the union of the reference's SHARED_FOREST (forest in fast
memory, Struct.h:1245-1409) and SPLIT_FOREST (tree chunks + partial-sum
reduction, Struct.h:1414-1606) placements, with ``cub::DeviceSegmentedReduce``
replaced by in-VMEM accumulation over the inner grid dimension.

Data layout (chosen for the VPU, not translated from CUDA):

- rows on sublanes, nodes on lanes;
- node tables per level in **bit-reversed node-major flat** order
  (compiler.levelize + node-major: col = node_index * TR + tree), the TPU
  rendition of the reference's transposed "reorg" layout
  (Struct.h:1911-1923) — it makes every fold step a contiguous
  half-split select along lanes;
- feature selection is a per-vreg lane gather: ``take_along_axis`` of the
  row's 128-lane feature vector by the level's static fid columns, chunked in
  128-node pieces (Mosaic supports gathers from a single source vreg).

Missing-value handling is folded into IEEE compare semantics: the host
canonicalizes missing features to NaN, and each node precomputes two bits
  sel_lt = def_right XOR invert,   flip = def_right
so that ``cond = (sel_lt ? (x < t) : (x >= t)) XOR flip`` reproduces the
reference's three-way rule (Struct.h:380-403, 894-898) exactly — both
compares are False for NaN, making the flip bit the missing-route:

  (dr=0,inv=0): x>=t          NaN→False (left)   = !def_left routing
  (dr=0,inv=1): x< t          NaN→False          = exchange-inverted compare
  (dr=1,inv=0): !(x<t)        NaN→True  (right)
  (dr=1,inv=1): !(x>=t)       NaN→True

No is_leaf mask, no exchange decode, no per-lane control flow: ``depth``
unconditional vectorized select steps per tree tile.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from typing import NamedTuple, Tuple

from tahoe_tpu.config import MISSING_EPS, TpuLimits
from tahoe_tpu.forest.spec import LeveledForest
from tahoe_tpu.ops.transform import apply_output_transform

LANE = 128
# sign-form multi-vreg ceiling: V = ceil(F/128) feature vregs, V <= 4
MAX_SIGN_COLS = 4 * LANE


class FoldConfig(NamedTuple):
    """Static (hashable) kernel configuration — everything the pure functional
    kernel needs besides the table arrays. Shardable: the distributed layer
    builds one FoldConfig per tree shard and calls :func:`fold_margins` inside
    shard_map."""

    depth: int
    row_tile: int
    tree_tile: int
    padded_trees: int
    seg: Tuple[int, ...]
    leaf_seg: int
    interpret: bool = False
    # ge mode: single-compare tables from compiler.ge_normalize — one lane
    # gather + one >= per node, missing/exchange folded away at compile time
    ge: bool = False
    # sign-form ge (multi-vreg): rows keep V = ceil(F/128) feature vregs
    # instead of the dual [x, -x] single vreg; each node's table row carries
    # (lane, vreg, sign) and the condition is
    #   gather(x_vreg, lane) * sign >= t'
    # — the ``x < t  <=>  -x >= nextafter(-t)`` rewrite applied by a static
    # f32 multiply instead of a negated lane. Lifts the fused kernel's
    # feature ceiling from 64 (dual ge) to 512 live features; the TPU
    # rendition of the reference's ceiling-free row caching
    # (Struct.h:416-423). Requires ge=True.
    sign_form: bool = False
    # feature vregs (sign form); x blocks are [row_tile, 128*vregs]
    vregs: int = 1
    # deep-forest subtree blocking (ge mode only): levels > split_level are
    # folded one bottom subtree at a time, capping the live w buffer at
    # ~2^(depth-split_level-1)*TR + 2^split_level*TR columns instead of
    # 2^(depth-1)*TR. 0 = plain whole-level fold. Level tables for
    # d > split_level are laid out subtree-major (see _subtree_reorder); the
    # TPU rendition of streaming tree chunks through fast memory that the
    # reference's SPLIT_FOREST realizes with smem chunks (Struct.h:1414-1606).
    split_level: int = 0
    # tree-OUTER grid: (tree tiles, row tiles) with rows innermost so each
    # tree tile's node tables stream into VMEM once per predict instead of
    # once per row tile; partial margins land in a [tiles, rows, 1] slab
    # summed by XLA (see rank_kernel.RankFoldConfig.tree_outer)
    tree_outer: bool = False


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


class FoldKernelEngine:
    """Compile a LeveledForest into device tables + a fused Pallas predict.

    ``row_tile`` rows × ``tree_tile`` trees per grid cell. Requires
    num_cols <= 128 (one feature vreg per row) and the tile's node tables to
    fit VMEM — checked by :meth:`vmem_bytes` against TpuLimits (the analog of
    the reference's shared-memory feasibility asserts, Struct.h:550-552).
    """

    def __init__(
        self,
        leveled: LeveledForest,
        *,
        row_tile: int = 128,
        tree_tile: int = 64,
        interpret: bool = False,
        ge_mode: bool | None = None,
        split_level: int | None = None,
        col_index=None,
        limits: TpuLimits = TpuLimits(),
    ):
        # used-feature compaction: wide forests (gisette-class) reference only
        # a subset of columns; remap live fids and gather only those data
        # columns (exact — compiler.compact_features). Callers that already
        # compacted pass col_index explicitly. The reference has no feature
        # ceiling (rows cached whole, Struct.h:416-423); compaction + the
        # multi-vreg x blocks below are the TPU rendition of "no ceiling".
        self._col_index = None
        if col_index is not None:
            self._col_index = np.asarray(col_index, np.int32)
        elif leveled.num_cols > LANE or (
            ge_mode is not False and 2 * leveled.num_cols > LANE
        ):
            from tahoe_tpu.forest.compiler import compact_leveled

            leveled, used = compact_leveled(leveled)
            if used is not None:
                self._col_index = used
        if leveled.num_cols > MAX_SIGN_COLS:
            raise NotImplementedError(
                f"FoldKernelEngine supports up to {MAX_SIGN_COLS} live "
                f"features; got {leveled.num_cols} (use TensorEngine)"
            )
        # ge has two realizations: dual-lane [x, -x] in ONE vreg (needs
        # 2F <= 128; 3 VPU ops/node) and the sign-form multi-vreg variant
        # (F <= MAX_SIGN_COLS; V-way gather-select + sign multiply). Auto:
        # dual when it fits, sign form for wider forests, non-ge only when
        # explicitly requested.
        if ge_mode is None:
            ge_mode = leveled.num_cols <= MAX_SIGN_COLS
        if ge_mode and leveled.num_cols > MAX_SIGN_COLS:
            raise NotImplementedError(
                f"sign-form ge supports <= {MAX_SIGN_COLS} live features; got "
                f"{leveled.num_cols}"
            )
        self.ge_mode = ge_mode
        self.sign_form = bool(ge_mode and 2 * leveled.num_cols > LANE)
        self.vregs = _cdiv(leveled.num_cols, LANE) if self.sign_form else 1
        self.depth = leveled.depth
        self.num_trees = leveled.num_trees
        self.num_cols = leveled.num_cols
        self.output = leveled.output
        self.global_bias = leveled.global_bias
        self.threshold = leveled.threshold
        self.missing = leveled.missing
        self.row_tile = row_tile
        # power-of-2 tree tiles keep every fold level either a single
        # sub-128-lane chunk or an exact multiple of 128-lane chunks
        tt = min(tree_tile, max(leveled.num_trees, 8))
        self.tree_tile = 1 << (tt - 1).bit_length()
        self.interpret = interpret

        n_tiles = -(-max(leveled.num_trees, self.tree_tile) // self.tree_tile)
        if split_level is None:
            # smallest split level whose peak VMEM fits (0 = plain fold);
            # least-VMEM candidate as a last resort
            candidates = self.valid_split_levels(
                leveled.depth, self.tree_tile, self.ge_mode
            )
            split_level = next(
                (ls for ls in candidates if self.vmem_bytes(
                    leveled.depth, self.row_tile, self.tree_tile, ls, n_tiles,
                    vregs=self.vregs, sign_form=self.sign_form,
                ) <= limits.fold_usable_vmem),
                min(candidates, key=lambda ls: self.vmem_bytes(
                    leveled.depth, self.row_tile, self.tree_tile, ls, n_tiles,
                    vregs=self.vregs, sign_form=self.sign_form,
                )),
            )
        elif split_level > 0 and split_level not in self.valid_split_levels(
            leveled.depth, self.tree_tile, self.ge_mode
        ):
            raise ValueError(
                f"split_level {split_level} invalid for depth "
                f"{leveled.depth}, tree_tile {self.tree_tile}, "
                f"ge_mode {self.ge_mode}"
            )
        wall = self.compile_wall(leveled.depth, split_level)
        if wall is not None:
            raise NotImplementedError(wall)
        self.split_level = split_level

        need = self.vmem_bytes(leveled.depth, self.row_tile, self.tree_tile,
                               split_level, n_tiles, vregs=self.vregs,
                               sign_form=self.sign_form)
        if not interpret and need > limits.fold_usable_vmem:
            raise ValueError(
                f"tile needs ~{need/2**20:.1f} MiB VMEM > budget "
                f"{limits.fold_usable_vmem/2**20:.1f} MiB; shrink row_tile/tree_tile"
            )

        self._build_tables(leveled)
        # NOTE: tables are passed as explicit jit arguments, never captured in
        # the closure — on the axon remote backend, closure-captured device
        # arrays are re-shipped through the tunnel on every call (~25 ms for
        # SUSY-size tables), while argument arrays stay device-resident.
        self._predict = jax.jit(self._predict_impl)
        self._predict_k = jax.jit(self._chain_impl, static_argnames=("k",))

    # ------------------------------------------------------------------
    @staticmethod
    def vmem_bytes(depth: int, row_tile: int, tree_tile: int,
                   split_level: int = 0, tree_tiles: int = 2,
                   vregs: int = 1, sign_form: bool = False) -> int:
        """Rough peak VMEM estimate for feasibility checks: level tables
        (x2 when the tree grid revolves — Pallas double-buffers streamed
        input blocks; a single tree tile needs no lookahead buffer) plus the
        largest live w buffer x1.25 (measured Mosaic scoped-vmem reuse on
        v5e: 21.4M actual for a 16.8M w_top at depth 8/TR=128). With subtree
        blocking the live w is one subtree's top level plus the accumulated
        roots."""
        nodes = (1 << depth) - 1
        buf = 2 if tree_tiles > 1 else 1
        # sign form adds int32 vsel + f32 sign tables per node
        per_node = 16 if sign_form else (4 + 4 + 1 + 1)
        if split_level > 0:
            # subtree-group grid (r4 restructure): per grid cell = the top
            # node-major tables (buffered when the grid revolves) + ONE
            # group's bottom slabs (always double-buffered by the pipeline)
            # + the roots scratch + one group's live fold frontier
            db = depth - split_level
            tables = (buf * tree_tile * (1 << split_level) * per_node
                      + 2 * (1 << db) * LANE * per_node
                      + 2 * (1 << db) * LANE * 4)
            scratch = row_tile * (tree_tile << split_level) * 4
            w_live = 2 * row_tile * (1 << max(db - 1, 0)) * LANE * 4
            w_live += scratch
        else:
            tables = buf * tree_tile * (nodes * per_node + (1 << depth) * 4)
            w_top = row_tile * (1 << max(depth - 1, 0)) * tree_tile * 4
            w_live = w_top + w_top // 4
        if sign_form and vregs >= 2:
            # multi-vreg sign gathers keep per-level cond/select chains live
            # alongside the frontier: measured 102.7M actual vs ~12M
            # estimated on allstate-class (130 live features, depth 8,
            # rt128/tt128 whole-forest — real scoped OOM, r3 sweep); x4 on
            # the live term lands estimates in the calibrated band without
            # killing the single-vreg sign configs proven in smoke
            w_live *= 4
        return int(tables + w_live + row_tile * LANE * vregs * 8)

    # bottom-unroll compile wall: one grid step unrolls 2^Db 128-lane fold
    # chunks; Db = 8 (the statement count of a whole SUSY-class tile) is the
    # largest proven-fast Mosaic compile — beyond it compile time climbs
    # toward the measured depth-15 whole-tree explosion (feasibility gate,
    # VERDICT r3 weak #3: an un-runnable strategy must never be predicted)
    MAX_SPLIT_BOTTOM = 8
    # whole-level (split 0) unroll is compile-proven through depth 14 on v5e;
    # 15 ran >8 min without finishing (r1)
    MAX_UNSPLIT_DEPTH = 14

    @classmethod
    def compile_wall(cls, depth: int, split_level: int):
        """Measured Mosaic compile-time wall (mirrors rank_kernel's): None
        if the config compiles in bounded time, else the reason string."""
        if split_level == 0 and depth > cls.MAX_UNSPLIT_DEPTH:
            return (f"whole-level fold at depth {depth} > "
                    f"{cls.MAX_UNSPLIT_DEPTH}: Mosaic compile measured "
                    f">8 min on v5e (r1)")
        if split_level and depth - split_level > cls.MAX_SPLIT_BOTTOM:
            return (f"split fold with {depth - split_level} bottom levels "
                    f"> {cls.MAX_SPLIT_BOTTOM}: 2^Db-statement unroll per "
                    f"grid step exceeds the bounded-compile budget")
        return None

    @classmethod
    def valid_split_levels(cls, depth: int, tree_tile: int,
                           ge_mode: bool) -> list:
        """Usable split levels, smallest first (0 = plain fold). Subtree
        blocking needs ge mode, tree_tile <= 128 (virtual-tile grouping) and
        a root span covering whole 128-lane vregs; compile-walled levels are
        excluded (walled 0 is kept only when no split level is usable, so
        the engine still constructs shallow non-ge forests)."""
        out = [0]
        if ge_mode and tree_tile <= LANE:
            for ls in range(1, depth):
                if (tree_tile << ls) >= LANE and not cls.compile_wall(
                        depth, ls):
                    out.append(ls)
        if len(out) > 1 and cls.compile_wall(depth, 0):
            out = out[1:]
        return out

    @classmethod
    def min_vmem_bytes(cls, depth: int, row_tile: int, tree_tile: int,
                       ge_mode: bool = True, num_trees: int = 0,
                       vregs: int = 1, sign_form: bool = False) -> int:
        """Min peak VMEM over allowed split levels (for feasibility checks)."""
        tiles = max(1, -(-max(num_trees, tree_tile) // tree_tile)) if num_trees else 2
        return min(
            cls.vmem_bytes(depth, row_tile, tree_tile, ls, tiles,
                           vregs=vregs, sign_form=sign_form)
            for ls in cls.valid_split_levels(depth, tree_tile, ge_mode)
        )

    # ------------------------------------------------------------------
    def _build_tables(self, lev: LeveledForest) -> None:
        T = lev.num_trees
        TR = self.tree_tile
        Tp = _round_up(max(T, TR), TR)
        self.padded_trees = Tp
        D = lev.depth

        def pad_tree_axis(a, fill):
            if a.shape[0] == Tp:
                return a
            pad = np.full((Tp - a.shape[0],) + a.shape[1:], fill, dtype=a.dtype)
            return np.concatenate([a, pad], axis=0)

        def tile_node_major(a, fill):
            """[Tp, n] → flat [1, ntiles*seg] ordered (tile, node_j, tree_in_tile)
            — per-tile node-major, the tile-local rendition of the reference's
            transposed "reorg" layout. Within a tile, col = j*TR + tr, so the
            fold's half-splits on j are contiguous. Each tile segment is padded
            to a 128-lane multiple (Pallas block-shape constraint); the kernel
            reads only the first n*TR columns."""
            n = a.shape[1]
            t = np.ascontiguousarray(a.reshape(Tp // TR, TR, n).transpose(0, 2, 1))
            t = t.reshape(Tp // TR, n * TR)
            seg = _round_up(n * TR, LANE)
            if seg != n * TR:
                padb = np.full((Tp // TR, seg - n * TR), fill, dtype=a.dtype)
                t = np.concatenate([t, padb], axis=1)
            return t.reshape(1, -1)

        Ls = self.split_level
        if Ls:
            # split grid: top levels node-major, bottom levels + leaf in
            # per-(tree tile, subtree group) slabs — col = c*128 +
            # s_local*TR + tr with c the subtree-local bit-reversed node
            # index (identical to rank_kernel's tile_subtree_mat layout)
            self.seg = [_round_up((1 << d) * TR, LANE) for d in range(Ls)]
            self.leaf_seg = (1 << (D - Ls)) * LANE
        else:
            self.seg = [_round_up((1 << d) * TR, LANE) for d in range(D)]
            self.leaf_seg = _round_up((1 << D) * TR, LANE)

        def tile_subtree(a):
            """[Tp, 2^(Ls+b)] (bit-reversed level order, j = c*2^Ls + s) →
            flat [1, ntiles*SG*2^b*128] ordered (tile, group, c, s_local,
            tr). Also handles the leaf level (b = D - Ls)."""
            g = LANE // TR
            SG = (TR << Ls) // LANE
            nb = a.shape[1] >> Ls  # 2^b
            m = a.reshape(Tp // TR, TR, nb, SG, g)
            return np.ascontiguousarray(
                m.transpose(0, 3, 2, 4, 1)).reshape(1, -1)

        def layout(a, d, fill):
            """Level-d table → kernel layout (node-major above the split,
            subtree-group slabs below)."""
            if Ls and d >= Ls:
                return tile_subtree(a)
            return tile_node_major(a, fill)

        if self.ge_mode:
            from tahoe_tpu.forest.compiler import ge_normalize

            fid_l, thr_l, leaf_ge = ge_normalize(lev)
            thresh, fid, vsel, sign = [], [], [], []
            F = lev.num_cols
            for d in range(D):
                th = pad_tree_axis(thr_l[d], np.float32(np.nan))
                fv = fid_l[d]
                thresh.append(jnp.asarray(layout(th, d, np.float32(np.nan))))
                if self.sign_form:
                    # decompose the virtual fid (f or f+F for the negated
                    # form) into (lane, vreg, sign): the kernel gathers
                    # lane from vreg and multiplies by sign — the negated
                    # lane of dual ge realized arithmetically
                    neg = fv >= F
                    f = fv - F * neg
                    lane = pad_tree_axis((f % LANE).astype(np.int32),
                                         np.int32(0))
                    vr = pad_tree_axis((f // LANE).astype(np.int32),
                                       np.int32(0))
                    sg = pad_tree_axis(
                        (1.0 - 2.0 * neg).astype(np.float32), np.float32(1.0))
                    fid.append(jnp.asarray(layout(lane, d, np.int32(0))))
                    vsel.append(jnp.asarray(layout(vr, d, np.int32(0))))
                    sign.append(jnp.asarray(layout(sg, d, np.float32(1.0))))
                else:
                    fd = pad_tree_axis(fv, np.int32(0))
                    fid.append(jnp.asarray(layout(fd, d, np.int32(0))))
            leaf = pad_tree_axis(leaf_ge, np.float32(0))
            leaf_t = (tile_subtree(leaf) if Ls
                      else tile_node_major(leaf, np.float32(0)))
            if self.sign_form:
                self.tables = (*thresh, *fid, *vsel, *sign,
                               jnp.asarray(leaf_t))
            else:
                self.tables = (*thresh, *fid, jnp.asarray(leaf_t))
        else:
            thresh, fid, sel_lt, flip = [], [], [], []
            for d in range(D):
                th = pad_tree_axis(lev.thresh[d], np.float32(np.nan))
                fd = pad_tree_axis(lev.fid[d], np.int32(0))
                dr = pad_tree_axis(lev.def_right[d], False)
                iv = pad_tree_axis(lev.invert[d], False)
                thresh.append(jnp.asarray(tile_node_major(th, np.float32(np.nan))))
                fid.append(jnp.asarray(tile_node_major(fd, np.int32(0))))
                sel_lt.append(
                    jnp.asarray(tile_node_major((dr ^ iv).astype(np.int32), np.int32(0)))
                )
                flip.append(
                    jnp.asarray(tile_node_major(dr.astype(np.int32), np.int32(0)))
                )
            leaf = pad_tree_axis(lev.leaf_values, np.float32(0))
            # one flat tuple pytree, passed as a jit argument on every call
            self.tables = (*thresh, *fid, *sel_lt, *flip,
                           jnp.asarray(tile_node_major(leaf, np.float32(0))))
        self.cfg = FoldConfig(
            depth=D, row_tile=self.row_tile, tree_tile=TR, padded_trees=Tp,
            seg=tuple(self.seg), leaf_seg=self.leaf_seg,
            interpret=self.interpret, ge=self.ge_mode,
            split_level=self.split_level, tree_outer=True,
            sign_form=self.sign_form, vregs=self.vregs,
        )

    # ------------------------------------------------------------------
    @property
    def table_tile_cols(self):
        """Per-table column count per TREE TILE, in self.tables order — the
        distributed layer reshapes each flat [1, ntiles*cols] table into
        per-shard slabs with these widths (tile-major layout invariant)."""
        n_kinds = 2 if (self.ge_mode and not self.sign_form) else 4
        Ls = self.split_level
        if Ls:
            SG = (self.tree_tile << Ls) // LANE
            Db = self.depth - Ls
            per_kind = list(self.seg) + [SG * (1 << b) * LANE
                                         for b in range(Db)]
            return per_kind * n_kinds + [SG * (1 << Db) * LANE]
        return list(self.seg) * n_kinds + [self.leaf_seg]

    # ------------------------------------------------------------------
    def _canonicalize(self, x):
        """Pad features to 128 lanes, map missing to NaN; in ge mode also
        append the negated lanes [x, -x] (see compiler.ge_normalize). With a
        col_index (used-feature compaction) only the live columns are kept."""
        x = x.astype(jnp.float32)
        if self._col_index is not None:
            x = x[:, self._col_index]
        if np.isnan(np.float32(self.missing)):
            miss = jnp.isnan(x)
        else:
            miss = jnp.abs(x - jnp.float32(self.missing)) <= jnp.float32(MISSING_EPS)
        x = jnp.where(miss, jnp.float32(np.nan), x)
        if self.ge_mode and not self.sign_form:
            x = jnp.concatenate([x, -x], axis=1)
        pad = LANE * self.vregs - x.shape[1]
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)))
        return x

    # ------------------------------------------------------------------
    def _margins_padded(self, tables, x_pad):
        return fold_margins(self.cfg, tables, x_pad)

    def _predict_impl(self, tables, data):
        rows = data.shape[0]
        x = self._canonicalize(data)
        pad = (-rows) % self.row_tile
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, x.shape[1]), jnp.float32)], axis=0)
        margins = self._margins_padded(tables, x)[:rows]
        return apply_output_transform(
            margins, self.num_trees, self.output, self.global_bias,
            self.threshold, jnp,
        )

    def _chain_impl(self, tables, data, k):
        """k serialized predicts in one dispatch (honest timing harness)."""
        def body(_, acc):
            return self._predict_impl(tables, data + acc[0] * 0.0)

        return jax.lax.fori_loop(
            0, k, body, jnp.zeros(data.shape[0], jnp.float32)
        )

    # ------------------------------------------------------------------
    def predict(self, data) -> jax.Array:
        return self._predict(self.tables, jnp.asarray(data))

    def predict_k(self, data, k: int) -> jax.Array:
        return self._predict_k(self.tables, jnp.asarray(data), k=k)

    def margins(self, data) -> jax.Array:
        data = jnp.asarray(data, dtype=jnp.float32)
        rows = data.shape[0]
        x = self._canonicalize(data)
        pad = (-rows) % self.row_tile
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, x.shape[1]), jnp.float32)], axis=0)
        return self._margins_padded(self.tables, x)[:rows]


# ---------------------------------------------------------------------------
# Pure functional core (shard_map-compatible)
# ---------------------------------------------------------------------------

def _make_kernel(cfg: FoldConfig):
    D = cfg.depth
    TR = cfg.tree_tile
    Rt = cfg.row_tile
    if cfg.split_level:
        return _make_split_kernel(cfg)

    def kernel(x_ref, *refs):
        th_refs = refs[0:D]
        fid_refs = refs[D : 2 * D]
        if cfg.ge and cfg.sign_form:
            sel_refs = flip_refs = None
            vsel_refs = refs[2 * D : 3 * D]
            sign_refs = refs[3 * D : 4 * D]
            leaf_ref = refs[4 * D]
            out_ref = refs[4 * D + 1]
        elif cfg.ge:
            sel_refs = flip_refs = vsel_refs = sign_refs = None
            leaf_ref = refs[2 * D]
            out_ref = refs[2 * D + 1]
        else:
            sel_refs = refs[2 * D : 3 * D]
            flip_refs = refs[3 * D : 4 * D]
            leaf_ref = refs[4 * D]
            out_ref = refs[4 * D + 1]

        x = x_ref[:]  # [Rt, 128*vregs] NaN-canonicalized features
        # sign form: V feature vregs; gathers are per-vreg, the node's vreg
        # chosen by a static select chain, sign applied by an f32 multiply
        xv_blocks = [x[:, v * LANE : (v + 1) * LANE] for v in range(cfg.vregs)]

        def level_cond(d, n):
            """Branch conditions for the n live node columns of level d.

            Chunked in 128-lane pieces: the lane gather needs a single source
            vreg, so each chunk gathers from the row's one feature vreg.
            Table segments are 128-padded (NaN thresholds → cond False), so
            full-vreg reads are always in bounds; the result is cut to n.
            """
            parts = []
            for c0 in range(0, _round_up(n, LANE), LANE):
                idx = jnp.broadcast_to(fid_refs[d][:, c0 : c0 + LANE], (Rt, LANE))
                xv = jnp.take_along_axis(xv_blocks[0], idx, axis=1)
                th = th_refs[d][:, c0 : c0 + LANE]
                if cfg.ge:
                    # single-compare form: all routing semantics pre-folded
                    parts.append(xv >= th)
                else:
                    # compare results kept in int32: Mosaic rejects select/xor
                    # on i1 vectors ("unsupported target bitwidth")
                    ge = (xv >= th).astype(jnp.int32)
                    lt = (xv < th).astype(jnp.int32)
                    r = jnp.where(sel_refs[d][:, c0 : c0 + LANE] != 0, lt, ge)
                    parts.append(r != flip_refs[d][:, c0 : c0 + LANE])
            cond = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
            return cond[:, :n]

        # bottom-up select-fold; all half-splits are contiguous thanks to the
        # bit-reversed node-major layout. In ge mode the whole fold is kept as
        # a LIST of 128-lane chunks — conds are consumed the moment they're
        # computed and nothing is ever concatenated, so every intermediate
        # stays in vector registers.
        if cfg.ge:
            def cond_chunk(d, c0):
                idx = jnp.broadcast_to(fid_refs[d][:, c0 : c0 + LANE], (Rt, LANE))
                xv = jnp.take_along_axis(xv_blocks[0], idx, axis=1)
                if cfg.sign_form:
                    for v in range(1, cfg.vregs):
                        alt = jnp.take_along_axis(xv_blocks[v], idx, axis=1)
                        pick = jnp.broadcast_to(
                            vsel_refs[d][:, c0 : c0 + LANE], (Rt, LANE)) == v
                        xv = jnp.where(pick, alt, xv)
                    xv = xv * jnp.broadcast_to(
                        sign_refs[d][:, c0 : c0 + LANE], (Rt, LANE))
                return xv >= th_refs[d][:, c0 : c0 + LANE]

            def leaf_bcast(c0):
                return jnp.broadcast_to(leaf_ref[:, c0 : c0 + LANE], (Rt, LANE))

            def fold_level(d, n, off, leaf_off, w):
                """One fold level: conds from level-d table columns
                [off, off+n); children from the chunk list ``w`` (covering
                [off*2 span]) or, when ``w`` is None, from the leaf slab at
                ``leaf_off`` (width 2n)."""
                n_chunks = _cdiv(n, LANE)
                new_w = []
                for c in range(n_chunks):
                    if n >= LANE:
                        cnd = cond_chunk(d, off + c * LANE)
                    else:
                        # sub-vreg span: read an aligned 128 window and cut
                        # (off is a multiple of n, so the span stays inside)
                        base = (off // LANE) * LANE
                        cnd = cond_chunk(d, base)[:, off - base : off - base + n]
                    if w is None and n >= LANE:
                        lo = leaf_bcast(leaf_off + c * LANE)
                        hi = leaf_bcast(leaf_off + n + c * LANE)
                    elif w is None:
                        # whole leaf span (2n <= LANE) inside one window
                        lb = (leaf_off // LANE) * LANE
                        ld = leaf_off - lb
                        chunk = leaf_bcast(lb)
                        lo, hi = chunk[:, ld : ld + n], chunk[:, ld + n : ld + 2 * n]
                    elif n >= LANE:
                        lo, hi = w[c], w[c + n_chunks]
                    else:
                        # sub-chunk levels: halves live inside chunk 0
                        lo, hi = w[0][:, :n], w[0][:, n : 2 * n]
                    new_w.append(jnp.where(cnd, hi, lo))
                return new_w

            w = None
            for d in range(D - 1, -1, -1):
                w = fold_level(d, (1 << d) * TR, 0, 0, w)
            if w is None:  # depth 0: forest of stumps
                w = [leaf_bcast(0)]
            wv = w[0][:, :TR] if TR < LANE else None
            if wv is None:
                partial = jnp.sum(w[0], axis=1, keepdims=True)
                for c in range(1, len(w)):
                    partial = partial + jnp.sum(w[c], axis=1, keepdims=True)
            else:
                partial = jnp.sum(wv, axis=1, keepdims=True)
        else:
            w = None
            for d in range(D - 1, -1, -1):
                n = (1 << d) * TR  # nodes in this level * trees
                cond = level_cond(d, n)
                if w is None:
                    lo = jnp.broadcast_to(leaf_ref[:, :n], (Rt, n))
                    hi = jnp.broadcast_to(leaf_ref[:, n : 2 * n], (Rt, n))
                else:
                    lo, hi = w[:, :n], w[:, n:]
                w = jnp.where(cond, hi, lo)

            if w is None:  # depth 0
                w = jnp.broadcast_to(leaf_ref[:, :TR], (Rt, TR))

            partial = jnp.sum(w, axis=1, keepdims=True)  # [Rt, 1]

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


def _make_split_kernel(cfg: FoldConfig):
    """Subtree-group grid variant (split_level > 0) — the round-4 restructure.

    Round 3's form unrolled all 2^Ls bottom subtrees inside one grid cell, so
    Mosaic compile time scaled with 2^Ls × 2^Db statements — depth 14 configs
    ran past the benchmark-subprocess timeout and depth 15 was gated off
    outright (VERDICT r3 weak #3). The grid's third axis now walks subtree
    GROUPS: g = 128/TR adjacent subtrees form one virtual tile of 128 virtual
    trees (exactly rank_kernel's split grid), each grid step folds ONE
    group's bottom Db levels — compile size O(2^Db), independent of Ls — and
    parks the group's 128 root values in VMEM scratch; the last group folds
    the top Ls levels over the scratch and accumulates margins across tree
    tiles. Bottom tables stream per group through the Pallas pipeline: the
    TPU rendition of the reference's SPLIT_FOREST smem chunking
    (Struct.h:1414-1606) applied along the depth axis.

    Bottom tables are laid out per (tree tile, group) slab with
    col = c*128 + s_local*TR + tr (c the subtree-local bit-reversed node
    index) — see the engine's ``tile_subtree`` — so every fold half-split
    stays a contiguous 128-lane chunk pairing.
    """
    D = cfg.depth
    TR = cfg.tree_tile
    Rt = cfg.row_tile
    Ls = cfg.split_level
    Db = D - Ls
    SG = (TR << Ls) // LANE
    assert cfg.ge, "subtree-split fold requires ge mode"

    def kernel(x_ref, *refs):
        n_kinds = 4 if cfg.sign_form else 2
        th_refs = refs[0:D]
        fid_refs = refs[D : 2 * D]
        if cfg.sign_form:
            vsel_refs = refs[2 * D : 3 * D]
            sign_refs = refs[3 * D : 4 * D]
        leaf_ref = refs[n_kinds * D]
        out_ref = refs[n_kinds * D + 1]
        roots_ref = refs[n_kinds * D + 2]  # VMEM scratch [SG, Rt, 128]

        x = x_ref[:]  # [Rt, 128*vregs] NaN-canonicalized features
        xv_blocks = [x[:, v * LANE : (v + 1) * LANE] for v in range(cfg.vregs)]

        def cond_chunk(d, c0):
            idx = jnp.broadcast_to(fid_refs[d][:, c0 : c0 + LANE], (Rt, LANE))
            xv = jnp.take_along_axis(xv_blocks[0], idx, axis=1)
            if cfg.sign_form:
                for v in range(1, cfg.vregs):
                    alt = jnp.take_along_axis(xv_blocks[v], idx, axis=1)
                    pick = jnp.broadcast_to(
                        vsel_refs[d][:, c0 : c0 + LANE], (Rt, LANE)) == v
                    xv = jnp.where(pick, alt, xv)
                xv = xv * jnp.broadcast_to(
                    sign_refs[d][:, c0 : c0 + LANE], (Rt, LANE))
            return xv >= th_refs[d][:, c0 : c0 + LANE]

        t = pl.program_id(1)
        s = pl.program_id(2)

        # ---- bottom fold: one group = 128 virtual trees of depth Db ----
        w = None
        for b in range(Db - 1, -1, -1):
            n_chunks = 1 << b  # level width (1<<b)*128 in 128-lane chunks
            new_w = []
            for c in range(n_chunks):
                cnd = cond_chunk(Ls + b, c * LANE)
                if w is None:
                    lo = jnp.broadcast_to(
                        leaf_ref[:, c * LANE : (c + 1) * LANE], (Rt, LANE))
                    hi = jnp.broadcast_to(
                        leaf_ref[:, (n_chunks + c) * LANE :
                                 (n_chunks + c + 1) * LANE], (Rt, LANE))
                else:
                    lo, hi = w[c], w[c + n_chunks]
                new_w.append(jnp.where(cnd, hi, lo))
            w = new_w
        roots_ref[s] = w[0]  # [Rt, 128] group root values

        # ---- top fold over all groups' roots, last group only ----
        @pl.when(s == SG - 1)
        def _top():
            def scratch_cols(c0):
                return roots_ref[c0 // LANE]

            w = None
            for d in range(Ls - 1, -1, -1):
                n = (1 << d) * TR
                n_chunks = _cdiv(n, LANE)
                new_w = []
                for c in range(n_chunks):
                    if n >= LANE:
                        cnd = cond_chunk(d, c * LANE)
                    else:
                        cnd = cond_chunk(d, 0)[:, :n]
                    if w is None and n >= LANE:
                        lo = scratch_cols(c * LANE)
                        hi = scratch_cols(n + c * LANE)
                    elif w is None:
                        sc = scratch_cols(0)
                        lo, hi = sc[:, :n], sc[:, n : 2 * n]
                    elif n >= LANE:
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

            @pl.when(t == 0)
            def _init():
                out_ref[:] = partial

            @pl.when(t != 0)
            def _acc():
                out_ref[:] = out_ref[:] + partial

    return kernel


def fold_margins(cfg: FoldConfig, tables, x_pad):
    """Raw margins [rows] for 128-lane-padded, NaN-canonicalized rows.

    Pure function of (static cfg, table pytree, data) — usable directly under
    jit, shard_map, or vmap-of-shards.
    """
    D = cfg.depth
    Rt = cfg.row_tile
    rows = x_pad.shape[0]
    n_tiles = cfg.padded_trees // cfg.tree_tile
    n_table_groups = (2 if (cfg.ge and not cfg.sign_form)
                      else 4)  # (thresh, fid[, sel|vsel, flip|sign])

    from tahoe_tpu.ops.mosaic import compile_kwargs

    if cfg.split_level:
        # subtree-group grid (r, t, s): see _make_split_kernel. Top tables
        # index by tree tile; bottom slabs + leaf by (tile, group).
        Ls = cfg.split_level
        Db = D - Ls
        SG = (cfg.tree_tile << Ls) // LANE
        grid = (rows // Rt, n_tiles, SG)
        in_specs = [pl.BlockSpec((Rt, LANE * cfg.vregs),
                                 lambda r, t, s: (r, 0),
                                 memory_space=pltpu.VMEM)]
        for _ in range(n_table_groups):
            for d in range(Ls):
                in_specs += [pl.BlockSpec((1, cfg.seg[d]),
                                          lambda r, t, s: (0, t),
                                          memory_space=pltpu.VMEM)]
            for b in range(Db):
                in_specs += [pl.BlockSpec(
                    (1, (1 << b) * LANE),
                    lambda r, t, s, _sg=SG: (0, t * _sg + s),
                    memory_space=pltpu.VMEM)]
        in_specs += [pl.BlockSpec(
            (1, (1 << Db) * LANE),
            lambda r, t, s, _sg=SG: (0, t * _sg + s),
            memory_space=pltpu.VMEM)]
        out_spec = pl.BlockSpec((Rt, 1), lambda r, t, s: (r, 0),
                                memory_space=pltpu.VMEM)
        margins = pl.pallas_call(
            _make_kernel(cfg),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((SG, Rt, LANE), jnp.float32)],
            interpret=cfg.interpret,
            **compile_kwargs(cfg.interpret),
        )(x_pad, *tables)
        return margins[:, 0]

    if cfg.tree_outer:
        grid = (n_tiles, rows // Rt)
        in_specs = [pl.BlockSpec((Rt, LANE * cfg.vregs),
                                 lambda t, r: (r, 0),
                                 memory_space=pltpu.VMEM)]
        for _ in range(n_table_groups):
            for d in range(D):
                in_specs += [pl.BlockSpec((1, cfg.seg[d]),
                                          lambda t, r: (0, t),
                                          memory_space=pltpu.VMEM)]
        in_specs += [pl.BlockSpec((1, cfg.leaf_seg), lambda t, r: (0, t),
                                  memory_space=pltpu.VMEM)]
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
        )(x_pad, *tables)
        return jnp.sum(partials[:, :, 0], axis=0)

    grid = (rows // Rt, n_tiles)

    in_specs = [pl.BlockSpec((Rt, LANE * cfg.vregs), lambda r, t: (r, 0),
                             memory_space=pltpu.VMEM)]
    for _ in range(n_table_groups):
        for d in range(D):
            in_specs += [pl.BlockSpec((1, cfg.seg[d]), lambda r, t: (0, t),
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
    )(x_pad, *tables)
    return margins[:, 0]


def canonicalize_rows(x, missing: float, num_cols: int, *,
                      col_index=None, vregs: int = 1):
    """Standalone row canonicalization (mirrors FoldKernelEngine._canonicalize)
    for the distributed layer. NOTE: non-ge form (no [x, -x] lanes)."""
    x = x.astype(jnp.float32)
    if col_index is not None:
        x = x[:, jnp.asarray(col_index)]
    if np.isnan(np.float32(missing)):
        miss = jnp.isnan(x)
    else:
        miss = jnp.abs(x - jnp.float32(missing)) <= jnp.float32(MISSING_EPS)
    x = jnp.where(miss, jnp.float32(np.nan), x)
    pad = LANE * vregs - x.shape[1]
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x
