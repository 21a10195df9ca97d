"""User-facing runtime: one Forest handle, five strategies, one predict.

The analog of the reference's public surface (``BaseTahoeTest`` ctor +
``forest::predict`` strategy dispatch, README.md:77-85, Struct.h:245-269,
2168-2179), redesigned: no mutable globals — the strategy is an explicit
argument or chosen by the performance model.

Strategy → engine mapping (see config.Strategy for the reference kernels each
one corresponds to):

  HBM_DIRECT   → GatherEngine            (jnp level-synchronous gathers, HBM)
  ROW_TILED    → TensorEngine('take')    (row-chunked select-fold, XLA)
  TENSOR       → TensorEngine('onehot')  (MXU one-hot selection, XLA)
  VMEM_FOREST  → FoldKernelEngine(tree_tile = whole forest)   (Pallas)
  SPLIT_FOREST → FoldKernelEngine(tree_tile = chunk)          (Pallas)
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tahoe_tpu.config import Strategy, TpuLimits
from tahoe_tpu.engine import feasibility
from tahoe_tpu.forest import compiler, io
from tahoe_tpu.forest.spec import ForestSpec
from tahoe_tpu.ops import oracle


class Forest:
    """A loaded, compiled forest plus lazily-built per-strategy engines."""

    def __init__(self, spec: ForestSpec, *, hot_swap: bool = True,
                 cluster: bool = True, limits: TpuLimits = TpuLimits()):
        # drop unreachable filler levels once, up front: trained forests come
        # as complete trees (reference loader materializes 2^(depth+1)-1
        # nodes, BaseTahoeTest.h:282-331) whose deep levels often hold no
        # reachable node — exact, and every engine/feasibility check then
        # sizes against the effective depth
        self.stored_depth = spec.depth
        d_eff = int(compiler.reachable_depths(spec).max(initial=0))
        if d_eff < spec.depth:
            spec = compiler.truncate_depth(spec, d_eff)
        self.spec = spec
        self.limits = limits
        # The gather/packed path uses the fully compiled forest (swap +
        # exchange bits + clustering); the leveled engines fold exchange away,
        # so they consume the unswapped forest — identical predictions, fewer
        # inverted compares (see compiler.levelize).
        self.compiled, self.leveled_sw, self.packed, self.tree_order = (
            compiler.compile_forest(spec, swap=hot_swap, cluster=cluster)
        )
        self.leveled = compiler.levelize(spec)
        self._engines: Dict = {}

    # ------------------------------------------------------------------
    @classmethod
    def from_files(cls, model_path: str, data_path: Optional[str] = None,
                   **kw) -> "Forest":
        """Load from the reference text model format; if a data file is given
        its num_cols and missing sentinel are adopted (the reference reads the
        sentinel from the data file header, BaseTahoeTest.h:370-371)."""
        num_cols = None
        missing = float("nan")
        if data_path is not None:
            import os

            if os.path.exists(data_path):
                _, nc, missing = _peek_data_header(data_path)
                num_cols = nc
        spec = io.load_model(model_path, num_cols=num_cols, missing=missing)
        return cls(spec, **kw)

    # ------------------------------------------------------------------
    def feasible(self, strategy: Strategy) -> Optional[str]:
        return feasibility.check(strategy, self.spec, self.limits)

    def engine(self, strategy: Strategy, *, row_tile: Optional[int] = None,
               tree_tile: Optional[int] = None,
               interpret: Optional[bool] = None):
        """Build (or fetch) the engine realizing a strategy.

        ``interpret`` defaults to True on CPU backends (Pallas TPU kernels run
        under the interpreter there — the multi-device CPU test path)."""
        if interpret is None:
            import jax

            interpret = jax.default_backend() == "cpu"
        key = (strategy, row_tile, tree_tile, interpret)
        if key in self._engines:
            return self._engines[key]
        reason = self.feasible(strategy)
        if reason is not None:
            raise ValueError(f"strategy {strategy.name} infeasible: {reason}")

        if strategy == Strategy.HBM_DIRECT:
            from tahoe_tpu.ops.gather_engine import GatherEngine

            eng = GatherEngine(self.compiled)
        elif strategy == Strategy.SPARSE:
            from tahoe_tpu.forest.sparse import SparseGatherEngine, from_dense
            from tahoe_tpu.ops.sparse_kernel import SparseRankEngine

            # fast tier: MXU-cond select-chain descent over the pruned pool;
            # falls back to the XLA gather descent when the pool or feature
            # count busts the kernel's caps
            eng = None
            if SparseRankEngine.feasible(self.spec, self.limits) is None:
                try:
                    eng = SparseRankEngine(
                        self.spec, row_tile=row_tile or 256,
                        interpret=interpret, limits=self.limits,
                    )
                except (NotImplementedError, ValueError):
                    eng = None
            if eng is None:
                eng = SparseGatherEngine(from_dense(self.spec))
        elif strategy == Strategy.RANK_MXU:
            from tahoe_tpu.ops.rank_kernel import RankFoldEngine

            # self.limits (default TpuLimits: 0.75 x the Mosaic scoped cap)
            # leaves margin for estimate error — a 0.95 fraction here once
            # admitted a config estimated at 57 MiB that actually needed
            # 97 MiB of scoped VMEM and failed to compile
            drt, dtt = feasibility.rank_default_tiles(self.spec, self.limits)
            eng = RankFoldEngine(
                self.spec,
                row_tile=row_tile or drt or 128,
                tree_tile=tree_tile or dtt or 64,
                interpret=interpret,
                limits=self.limits,
            )
        elif strategy == Strategy.DEPTH_BUCKETED:
            from tahoe_tpu.ops.bucketed import make_depth_bucketed_engine

            drt, dtt = feasibility.default_tiles(
                Strategy.SPLIT_FOREST, self.spec, self.limits
            )
            eng = make_depth_bucketed_engine(
                self.spec,
                row_tile=row_tile or drt,
                tree_tile=tree_tile or dtt,
                interpret=interpret,
                limits=self.limits,
            )
        elif strategy in (Strategy.ROW_TILED, Strategy.TENSOR):
            from tahoe_tpu.ops.tensor_engine import TensorEngine

            mode = "take" if strategy == Strategy.ROW_TILED else "onehot"
            eng = TensorEngine(
                self.leveled, select_mode=mode, row_tile=row_tile or 256
            )
        else:
            from tahoe_tpu.ops.fold_kernel import FoldKernelEngine

            drt, dtt = feasibility.default_tiles(strategy, self.spec, self.limits)
            eng = FoldKernelEngine(
                self.leveled,
                row_tile=row_tile or drt,
                tree_tile=tree_tile or dtt,
                interpret=interpret,
                limits=self.limits,
            )
        self._engines[key] = eng
        return eng

    # ------------------------------------------------------------------
    def predict(self, data, strategy: Strategy = Strategy.SPLIT_FOREST, **kw):
        return self.engine(strategy, **kw).predict(data)

    def predict_oracle(self, data) -> np.ndarray:
        """CPU golden model (BaseTahoeTest.h:458-487 analog)."""
        return oracle.predict(self.spec, data)


def _peek_data_header(path: str):
    with open(path, "r") as f:
        rows = int(f.readline())
        cols = int(f.readline())
        missing = float(f.readline())
    return rows, cols, missing
