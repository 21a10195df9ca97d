"""Sharded inference: batch-sharded, tree-sharded, and 2-D composed.

Built on shard_map over a ``(data, model)`` Mesh (mesh.py). Rows shard over
``data`` with zero communication; trees shard over ``model`` and per-shard
margins combine with a single f32 ``psum`` over ICI after traversal — the
cheapest possible collective pattern for this workload (one scalar per row),
matching BASELINE.json's "psum of per-tree margins" north star.

Each device runs the same fused Pallas select-fold kernel on its (row shard ×
tree shard); numerics match the single-chip engine to reduction order
(psum changes the tree-sum association, covered by the oracle tolerance,
cuda_base.h:103).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from tahoe_tpu.forest.spec import LeveledForest
from tahoe_tpu.ops.fold_kernel import (
    LANE,
    FoldConfig,
    FoldKernelEngine,
    fold_margins,
    _round_up,
)
from tahoe_tpu.ops.transform import apply_output_transform


class ShardedForestEngine:
    """Fold-kernel inference over a device mesh.

    ``mesh`` must have axes ("data", "model"); either may be size 1. Trees are
    split into ``mesh.shape['model']`` equal shards at table-build time (tree
    padding makes them equal); rows are sharded over "data" per call.
    """

    def __init__(self, leveled: LeveledForest, mesh: Mesh, *,
                 row_tile: int = 128, tree_tile: int = 64,
                 split_level: Optional[int] = None,
                 interpret: Optional[bool] = None):
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.mesh = mesh
        self.n_data = mesh.shape["data"]
        self.n_model = mesh.shape["model"]
        self.depth = leveled.depth
        self.num_trees = leveled.num_trees
        self.num_cols = leveled.num_cols
        self.output = leveled.output
        self.global_bias = leveled.global_bias
        self.threshold = leveled.threshold
        self.missing = leveled.missing
        self.row_tile = row_tile

        # Build one single-chip engine to reuse its table layout logic, with
        # the tree axis padded so every model shard holds the same tile count.
        shard_trees = _round_up(
            _round_up(max(leveled.num_trees, tree_tile), tree_tile),
            tree_tile * self.n_model,
        ) // self.n_model
        self._base = FoldKernelEngine(
            leveled, row_tile=row_tile,
            tree_tile=min(tree_tile, shard_trees), interpret=interpret,
            split_level=split_level,
        )
        base_cfg = self._base.cfg
        tiles_total = base_cfg.padded_trees // base_cfg.tree_tile
        if tiles_total % self.n_model:
            raise ValueError(
                f"{tiles_total} tree tiles not divisible by model axis "
                f"{self.n_model}; choose tree_tile so tiles divide evenly"
            )
        self.tiles_per_shard = tiles_total // self.n_model

        # Per-shard cfg: same tiling, fewer padded trees per device.
        self.cfg = FoldConfig(
            depth=base_cfg.depth,
            row_tile=base_cfg.row_tile,
            tree_tile=base_cfg.tree_tile,
            padded_trees=base_cfg.padded_trees // self.n_model,
            seg=base_cfg.seg,
            leaf_seg=base_cfg.leaf_seg,
            interpret=base_cfg.interpret,
            ge=base_cfg.ge,
            split_level=base_cfg.split_level,
            sign_form=base_cfg.sign_form,
            vregs=base_cfg.vregs,
        )

        # Reshape each flat table [1, ntiles*seg] → [n_model, shard_cols] so
        # shard_map's P("model", None) hands each device its tree shard.
        def split(t, seg):
            flat = np.asarray(t).reshape(tiles_total, seg)
            return jnp.asarray(
                flat.reshape(self.n_model, self.tiles_per_shard * seg)
            )

        segs = self._base.table_tile_cols
        self.tables = tuple(
            split(t, segs[i]) for i, t in enumerate(self._base.tables)
        )

        self._predict = jax.jit(self._predict_impl)

    # ------------------------------------------------------------------
    def _predict_impl(self, tables, data):
        rows = data.shape[0]
        # the base engine's canonicalizer knows the table mode (ge mode adds
        # the negated [x, -x] lanes)
        x = self._base._canonicalize(data)
        block = self.row_tile * self.n_data
        pad = (-rows) % block
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, x.shape[1]), jnp.float32)], axis=0)

        cfg = self.cfg

        def local_fn(tables_local, x_local):
            # tables_local leaves [1, shard_cols] — already kernel layout
            m = fold_margins(cfg, tables_local, x_local)
            if self.n_model > 1:
                # cross-chip margin combine: the distributed
                # DeviceSegmentedReduce (one psum of f32 per row over ICI)
                m = jax.lax.psum(m, "model")
            return m

        shard = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(
                jax.tree.map(lambda _: P("model", None), tables),
                P("data", None),
            ),
            out_specs=P("data"),
            # pallas_call's ShapeDtypeStruct carries no varying-mesh-axes
            # annotation; disable the vma check rather than threading it
            check_vma=False,
        )
        margins = shard(tables, x)[:rows]
        return apply_output_transform(
            margins, self.num_trees, self.output, self.global_bias,
            self.threshold, jnp,
        )

    # ------------------------------------------------------------------
    def predict(self, data) -> jax.Array:
        return self._predict(self.tables, jnp.asarray(data, jnp.float32))


class ShardedRankEngine:
    """Tree-sharded int8 rank-MXU inference over a device mesh.

    The flagship quantized engine's multichip form (VERDICT r1 item 4): the
    per-level int8 matrices shard on the tree axis across ``model``; rows
    shard across ``data``. The rank transform (quantization tables replicated)
    runs once on the global batch; per-shard margins combine with the same
    single f32 ``psum`` as the fold engine — the cross-device rendition of the
    reference's ``cub::DeviceSegmentedReduce`` (Struct.h:655-659).
    """

    def __init__(self, forest, mesh: Mesh, *, row_tile: int = 256,
                 tree_tile: int = 128, split_level: Optional[int] = None,
                 interpret: Optional[bool] = None, **engine_kw):
        from tahoe_tpu.ops.rank_kernel import RankFoldEngine

        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.mesh = mesh
        self.n_data = mesh.shape["data"]
        self.n_model = mesh.shape["model"]

        self._base = RankFoldEngine(
            forest, row_tile=row_tile, tree_tile=tree_tile,
            split_level=split_level, interpret=interpret, **engine_kw,
        )
        base_cfg = self._base.cfg
        tiles_total = base_cfg.padded_trees // base_cfg.tree_tile
        if tiles_total % self.n_model:
            raise ValueError(
                f"{tiles_total} tree tiles not divisible by model axis "
                f"{self.n_model}; choose tree_tile so tiles divide evenly"
            )
        self.tiles_per_shard = tiles_total // self.n_model
        self.cfg = base_cfg._replace(
            padded_trees=base_cfg.padded_trees // self.n_model
        )
        self.row_tile = self._base.row_tile
        self.num_trees = self._base.num_trees
        self.output = self._base.output
        self.global_bias = self._base.global_bias
        self.threshold = self._base.threshold
        self.groups = self._base.groups

        # every rank table is [L, tiles_total * rest] with the tree tile as
        # the leading factor of the column axis (mats L = 128*G; leaf L = 1)
        # → [n_model, L, tiles_per_shard * rest]
        def split(t):
            a = np.asarray(t)
            L = a.shape[0]
            a = a.reshape(L, self.n_model, -1)
            return jnp.asarray(np.ascontiguousarray(a.transpose(1, 0, 2)))

        self.tables = tuple(split(t) for t in self._base.tables)
        self.rank_tables = self._base.rank_tables
        self._predict = jax.jit(self._predict_impl)

    # ------------------------------------------------------------------
    def _predict_impl(self, tables, rank_tables, data):
        from tahoe_tpu.ops.rank_kernel import rank_fold_margins

        rows = data.shape[0]
        planes = self._base._transform(rank_tables, data)
        block = self.row_tile * self.n_data
        pad = (-planes.shape[0]) % block
        if pad:
            planes = jnp.concatenate(
                [planes, jnp.zeros((pad, planes.shape[1]), planes.dtype)],
                axis=0,
            )

        cfg = self.cfg

        def local_fn(tables_local, planes_local):
            local = tuple(t[0] for t in tables_local)  # drop the shard axis
            m = rank_fold_margins(cfg, local, planes_local)
            if self.n_model > 1:
                m = jax.lax.psum(m, "model")
            return m

        shard = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(
                jax.tree.map(lambda _: P("model", None, None), tables),
                P("data", None),
            ),
            out_specs=P("data"),
            check_vma=False,
        )
        margins = shard(tables, planes)[:rows]
        return apply_output_transform(
            margins, self.num_trees, self.output, self.global_bias,
            self.threshold, jnp,
        )

    # ------------------------------------------------------------------
    def predict(self, data) -> jax.Array:
        return self._predict(self.tables, self.rank_tables,
                             jnp.asarray(data, jnp.float32))


class ShardedSparseEngine:
    """Tree-sharded sparse rank-descent inference over a device mesh.

    The pool-priced CSR engine's multichip form (VERDICT r3 #7 — giant
    trained forests are exactly where tree-sharding pays): the per-level
    chunk-packed slot tables shard on their leading TREE-TILE axis (one tile
    = 128 tree lanes) across ``model``; rows shard across ``data``; the rank
    transform runs replicated on the global batch and per-shard margins
    combine with the same single f32 ``psum`` as the dense engines — the
    cross-device rendition of the reference's segmented margin reduction
    (Struct.h:655-659) over its dormant sparse path (Struct.h:2217-2353).
    """

    def __init__(self, forest, mesh: Mesh, *, row_tile: int = 8,
                 interpret: Optional[bool] = None, **engine_kw):
        from tahoe_tpu.ops.sparse_kernel import SparseRankEngine

        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.mesh = mesh
        self.n_data = mesh.shape["data"]
        self.n_model = mesh.shape["model"]

        self._base = SparseRankEngine(forest, row_tile=row_tile,
                                      interpret=interpret, **engine_kw)
        lv = self._base.lv
        if lv.n_tiles % self.n_model:
            raise ValueError(
                f"{lv.n_tiles} tree tiles (128 trees each) not divisible by "
                f"model axis {self.n_model}; pad trees to 128*n_model"
            )
        self.tiles_per_shard = lv.n_tiles // self.n_model
        # per-shard geometry: same slot pool (widths are maxima over ALL
        # trees), fewer tree tiles — sparse_rank_margins reads only shapes
        self.lv = lv._replace(
            mats=lv.mats[: self.tiles_per_shard],
            child=lv.child[: self.tiles_per_shard],
            val=lv.val[: self.tiles_per_shard],
            roots=lv.roots[: self.tiles_per_shard],
            n_tiles=self.tiles_per_shard,
        )
        # leading tree-tile axis → [n_model, tiles_per_shard, ...]
        self.tables = tuple(
            jnp.reshape(t, (self.n_model, self.tiles_per_shard)
                        + tuple(t.shape[1:]))
            for t in self._base.tables
        )
        self.rank_tables = self._base.rank_tables
        self.row_tile = self._base.row_tile
        self.interpret = interpret
        self._predict = jax.jit(self._predict_impl)

    # ------------------------------------------------------------------
    def _predict_impl(self, tables, rank_tables, data):
        from tahoe_tpu.ops.sparse_kernel import sparse_rank_margins

        base = self._base
        rows = data.shape[0]
        planes = base.tf.transform(rank_tables, data, row_tile=self.row_tile,
                                   interpret=self.interpret)
        block = self.row_tile * self.n_data
        pad = (-planes.shape[0]) % block
        if pad:
            planes = jnp.concatenate(
                [planes, jnp.zeros((pad, planes.shape[1]), planes.dtype)],
                axis=0,
            )

        lv = self.lv

        def local_fn(tables_local, planes_local):
            local = tuple(t[0] for t in tables_local)  # drop the shard axis
            m = sparse_rank_margins(lv, local, planes_local, self.row_tile,
                                    base.macro_chunks, self.interpret)
            if self.n_model > 1:
                m = jax.lax.psum(m, "model")
            return m

        shard = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(
                jax.tree.map(
                    lambda t: P(*(("model",) + (None,) * (t.ndim - 1))),
                    tables,
                ),
                P("data", None),
            ),
            out_specs=P("data"),
            check_vma=False,
        )
        margins = shard(tables, planes)[:rows]
        return apply_output_transform(
            margins, base.num_trees, base.output, base.global_bias,
            base.threshold, jnp,
        )

    # ------------------------------------------------------------------
    def predict(self, data) -> jax.Array:
        return self._predict(self.tables, self.rank_tables,
                             jnp.asarray(data, jnp.float32))


def batch_sharded_put(data, mesh: Mesh):
    """Place rows across the data axis ahead of time (multi-host input path)."""
    return jax.device_put(
        jnp.asarray(data, jnp.float32), NamedSharding(mesh, P("data", None))
    )
