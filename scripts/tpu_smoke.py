#!/usr/bin/env python
"""Real-TPU kernel-branch smoke test (VERDICT r1 item 7).

Interpret-mode tests cannot catch Mosaic layout/compile bugs (proven in
round 1: an XLA broadcast rewrite broke only the REAL compile). This script
compiles + runs + parity-checks every kernel branch on the actual chip, one
branch per subprocess (a Mosaic crash in one branch must not end the run;
sequential subprocesses also respect the one-JAX-process tunnel rule).

Parent:  python scripts/tpu_smoke.py           -> writes TPU_SMOKE_r02.json
Child:   python scripts/tpu_smoke.py --branch NAME
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

ROWS = 2048


def _mixed_depth_forest(seed=11):
    """Trained forest with varied reachable depths (triggers >1 bucket)."""
    from tahoe_tpu.forest.train import train_forest

    return train_forest(60, 10, 16, seed=seed)


def _wide_fid_forest(trees, depth, active, cols, seed):
    from tahoe_tpu.forest import synthetic

    return synthetic.generate_forest(trees, depth, cols, active_cols=active,
                                     seed=seed)


# each branch: () -> (engine_like, forest, data); engine_like has .predict
def _branches():
    from tahoe_tpu.config import TpuLimits
    from tahoe_tpu.forest import compiler, synthetic
    from tahoe_tpu.ops.fold_kernel import FoldKernelEngine
    from tahoe_tpu.ops.rank_kernel import RankFoldEngine

    limits = TpuLimits()

    def susy():
        return synthetic.susy_class_forest(seed=0)

    def data_for(f, rows=ROWS, seed=1):
        return synthetic.generate_data(rows, f.num_cols, missing_prob=0.02,
                                       seed=seed)

    def rank(f, **kw):
        kw.setdefault("limits", limits)
        return RankFoldEngine(f, **kw)

    def fold(f, **kw):
        return FoldKernelEngine(compiler.levelize(f), **kw)

    out = {}

    def add(name, builder):
        out[name] = builder

    add("rank_ls0_whole_level",
        lambda: (lambda f: (rank(f, row_tile=256, tree_tile=128,
                                 split_level=0), f, data_for(f)))(susy()))
    add("rank_ls4_stream_chunk",
        lambda: (lambda f: (rank(f, row_tile=1024, tree_tile=128,
                                 split_level=4), f, data_for(f)))(susy()))
    # banding triggers when a feature exceeds 16255 distinct thresholds:
    # 300 trees x depth 10 over 4 features ~= 76k thresholds/feature -> 5
    # bands each (20 virtual features), within the plane-group cap
    add("rank_banded",
        lambda: (lambda f: (rank(f, row_tile=256, tree_tile=64),
                            f, data_for(f)))(
            synthetic.generate_forest(300, 10, 4, seed=21)))
    add("rank_g2_40feat",
        lambda: (lambda f: (rank(f, row_tile=256, tree_tile=64), f,
                            data_for(f)))(
            synthetic.generate_forest(200, 8, 40, seed=3)))
    add("rank_g3_70feat",
        lambda: (lambda f: (rank(f, row_tile=256, tree_tile=64), f,
                            data_for(f)))(
            synthetic.generate_forest(200, 8, 70, seed=4)))
    add("rank_transform_decoupled_rt",
        lambda: (lambda f: (rank(f, row_tile=1024, tree_tile=128,
                                 split_level=4, transform_row_tile=4096),
                            f, data_for(f, rows=8192)))(susy()))
    add("rank_v2_bucketed_transform",
        lambda: (lambda f: (rank(f, row_tile=256, tree_tile=128), f,
                            data_for(f)))(
            synthetic.generate_forest(400, 8, 8, seed=5)))
    add("rank_cond_lead",
        lambda: (lambda f: (rank(f, row_tile=256, tree_tile=128,
                                 split_level=0, cond_lead=True), f,
                            data_for(f)))(susy()))
    add("rank_chunk_lead",
        lambda: (lambda f: (rank(f, row_tile=256, tree_tile=128,
                                 split_level=0, chunk_lead=True), f,
                            data_for(f)))(susy()))
    add("rank_deep12_split",
        lambda: (lambda f: (rank(f, row_tile=128, tree_tile=8,
                                 split_level=5), f, data_for(f)))(
            synthetic.generate_forest(100, 12, 30, seed=6)))
    # r4: the shipping headline config (single row tile at ROWS=2048) and
    # the opt-in fused transform+traversal form (FUSED_AB_r04.json)
    add("rank_rt2048_headline",
        lambda: (lambda f: (rank(f, row_tile=2048, tree_tile=128,
                                 split_level=4, col_chunk=2048,
                                 transform_row_tile=2048), f,
                            data_for(f)))(susy()))
    add("rank_fused_transform",
        lambda: (lambda f: (rank(f, row_tile=256, tree_tile=128,
                                 split_level=4, stream_once=False,
                                 fuse_transform=True), f,
                            data_for(f)))(susy()))

    # r5 wide extension (VERDICT r4 missing #1): > 120 virtual features —
    # G >= 5 plane groups through the whole-level AND split traversal grids,
    # plus the forced group-streamed v2 transform at small tables. Shapes
    # mirror the four previously-excluded reference datasets.
    add("rank_wide_g5_allstate",
        lambda: (lambda f: (rank(f, row_tile=256, tree_tile=64), f,
                            data_for(f)))(
            synthetic.generate_forest(250, 8, 130, seed=31)))
    add("rank_wide_g5_split",
        lambda: (lambda f: (rank(f, row_tile=256, tree_tile=64,
                                 split_level=3), f, data_for(f)))(
            synthetic.generate_forest(250, 8, 130, seed=31)))
    # THE layout boundary (r5 review finding): 121-128 features, G=5, x
    # widened to 256 lanes, v2 forced by ~400-threshold tables — aloi's shape
    add("rank_wide_g5_aloi128",
        lambda: (lambda f: (rank(f, row_tile=256, tree_tile=64), f,
                            data_for(f)))(
            synthetic.generate_forest(200, 8, 128, seed=35)))
    add("rank_wide_g10_cup98",
        lambda: (lambda f: (rank(f, row_tile=256, tree_tile=32), f,
                            data_for(f)))(
            _wide_fid_forest(150, 8, 300, 479, seed=32)))
    add("rank_wide_g13_mnist",
        lambda: (lambda f: (rank(f, row_tile=256, tree_tile=32), f,
                            data_for(f)))(
            synthetic.generate_forest(100, 6, 400, seed=33)))

    add("fold_ge_whole",
        lambda: (lambda f: (fold(f, row_tile=128, tree_tile=128), f,
                            data_for(f)))(susy()))
    add("fold_deep12_split",
        lambda: (lambda f: (fold(f, row_tile=64, tree_tile=64), f,
                            data_for(f)))(
            synthetic.generate_forest(100, 12, 30, seed=6)))
    add("fold_sign_v1_100feat",
        lambda: (lambda f: (fold(f, row_tile=256, tree_tile=128,
                                 ge_mode=True), f, data_for(f)))(
            _wide_fid_forest(200, 6, 100, 100, seed=7)))
    add("fold_sign_v3_300feat",
        lambda: (lambda f: (fold(f, row_tile=256, tree_tile=128,
                                 ge_mode=True), f, data_for(f)))(
            _wide_fid_forest(200, 6, 300, 900, seed=8)))

    def bucketed():
        from tahoe_tpu.ops.bucketed import make_depth_bucketed_engine
        from tahoe_tpu.forest import synthetic as syn

        f = _mixed_depth_forest()
        eng = make_depth_bucketed_engine(f)
        return eng, f, syn.generate_data(ROWS, f.num_cols, seed=9)

    add("depth_bucketed_auto", bucketed)

    def bucketed_fold():
        from tahoe_tpu.ops.bucketed import DepthBucketedFoldEngine
        from tahoe_tpu.forest import synthetic as syn

        f = _mixed_depth_forest(seed=12)
        eng = DepthBucketedFoldEngine(f)
        return eng, f, syn.generate_data(ROWS, f.num_cols, seed=10)

    add("depth_bucketed_fold", bucketed_fold)

    def sharded(engine_cls_name):
        def build():
            import jax

            from tahoe_tpu.parallel.mesh import make_mesh
            from tahoe_tpu.parallel import sharded as sh

            f = susy()
            mesh = make_mesh(data=1, model=1,
                             devices=jax.devices()[:1])
            if engine_cls_name == "fold":
                eng = sh.ShardedForestEngine(
                    compiler.levelize(f), mesh, row_tile=128, tree_tile=64)
            else:
                eng = sh.ShardedRankEngine(
                    f, mesh, row_tile=256, tree_tile=128)
            return eng, f, data_for(f)

        return build

    add("sharded_fold_1dev", sharded("fold"))
    add("sharded_rank_1dev", sharded("rank"))

    def sharded_sparse():
        import jax

        from tahoe_tpu.parallel.mesh import make_mesh
        from tahoe_tpu.parallel.sharded import ShardedSparseEngine
        from tahoe_tpu.forest import synthetic as syn

        f = _mixed_depth_forest(seed=15)
        mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
        eng = ShardedSparseEngine(f, mesh, row_tile=256)
        return eng, f, syn.generate_data(ROWS, f.num_cols, seed=15)

    add("sharded_sparse_1dev", sharded_sparse)

    def sparse():
        from tahoe_tpu.forest import sparse as sp

        f = _mixed_depth_forest(seed=13)
        eng = sp.SparseGatherEngine(sp.from_dense(f))
        from tahoe_tpu.forest import synthetic as syn

        return eng, f, syn.generate_data(ROWS, f.num_cols, seed=11)

    add("sparse_csr_descent", sparse)

    def sparse_rank():
        from tahoe_tpu.ops.sparse_kernel import SparseRankEngine
        from tahoe_tpu.forest import synthetic as syn

        f = _mixed_depth_forest(seed=14)
        eng = SparseRankEngine(f, row_tile=256, limits=limits)
        return eng, f, syn.generate_data(ROWS, f.num_cols, seed=12)

    add("sparse_rank_kernel", sparse_rank)

    def sparse_rank_stream():
        # full depth-12 trees: the pool busts the VMEM budget, forcing the
        # macro-streaming tier (round 3 loop-structured kernel)
        from tahoe_tpu.ops.sparse_kernel import SparseRankEngine
        from tahoe_tpu.forest import synthetic as syn

        f = syn.generate_forest(8, 12, 10, seed=13)
        eng = SparseRankEngine(f, row_tile=256, limits=limits)
        assert not eng.resident, "expected streaming tier"
        return eng, f, syn.generate_data(ROWS, f.num_cols, seed=13)

    add("sparse_rank_stream", sparse_rank_stream)

    def sparse_rank_wide():
        # r5: > 128 live features through the sparse engine's shared
        # group-streamed transform + G>=5 cond matmuls
        from tahoe_tpu.ops.sparse_kernel import SparseRankEngine
        from tahoe_tpu.forest import synthetic as syn

        f = syn.generate_forest(30, 6, 160, leaf_prob=0.15, seed=34)
        eng = SparseRankEngine(f, row_tile=256, limits=limits)
        assert eng.groups >= 5
        return eng, f, syn.generate_data(ROWS, f.num_cols, seed=34)

    add("sparse_rank_wide", sparse_rank_wide)

    assert set(out) == set(BRANCH_NAMES), (
        set(out) ^ set(BRANCH_NAMES)
    )
    return out


def run_branch(name: str) -> int:
    import jax

    from tahoe_tpu.ops import oracle

    builder = _branches()[name]
    eng, forest, data = builder()
    want = oracle.predict(forest, data)
    got = np.asarray(eng.predict(jax.device_put(np.asarray(data, np.float32))))
    err = float(np.abs(got - want).max())
    ok = err <= 1e-3
    print(json.dumps({"branch": name, "ok": ok, "max_err": err,
                      "device": str(jax.devices()[0])}), flush=True)
    return 0 if ok else 1


# static list for the PARENT process: building it via _branches() would
# import jax with the axon plugin on PYTHONPATH, and the plugin seizes the
# exclusive TPU tunnel at startup — every child would then futex-block
# forever behind its own parent (learned the hard way, round 2 session 2)
BRANCH_NAMES = [
    "rank_ls0_whole_level", "rank_ls4_stream_chunk", "rank_banded",
    "rank_g2_40feat", "rank_g3_70feat", "rank_transform_decoupled_rt",
    "rank_v2_bucketed_transform", "rank_cond_lead", "rank_chunk_lead",
    "rank_deep12_split", "rank_rt2048_headline", "rank_fused_transform",
    "rank_wide_g5_allstate", "rank_wide_g5_split", "rank_wide_g5_aloi128",
    "rank_wide_g10_cup98", "rank_wide_g13_mnist", "sparse_rank_wide",
    "fold_ge_whole", "fold_deep12_split",
    "fold_sign_v1_100feat", "fold_sign_v3_300feat", "depth_bucketed_auto",
    "depth_bucketed_fold", "sharded_fold_1dev", "sharded_rank_1dev",
    "sharded_sparse_1dev",
    "sparse_csr_descent", "sparse_rank_kernel", "sparse_rank_stream",
]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--branch", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--subset", default=None,
                   help="comma-separated branch names (subset of "
                        "BRANCH_NAMES) for a targeted artifact run")
    args = p.parse_args()
    if args.branch:
        return run_branch(args.branch)
    names = BRANCH_NAMES
    if args.subset:
        keep = set(args.subset.split(","))
        unknown = keep - set(BRANCH_NAMES)
        assert not unknown, f"unknown branches: {unknown}"
        names = [n for n in BRANCH_NAMES if n in keep]

    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.expanduser("~"), ".cache",
                                "tahoe_tpu_xla"))
    report = {"branches": {}, "ok": True}
    for name in names:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--branch", name],
                capture_output=True, text=True, env=env, timeout=900,
            )
            payload = None
            for line in reversed(r.stdout.strip().splitlines() or [""]):
                if line.strip().startswith("{"):
                    payload = json.loads(line)
                    break
            if payload is None:
                payload = {"branch": name, "ok": False,
                           "error": r.stderr.strip()[-400:]}
        except subprocess.TimeoutExpired:
            payload = {"branch": name, "ok": False, "error": "timeout"}
        report["branches"][name] = payload
        report["ok"] &= bool(payload.get("ok"))
        print(json.dumps(payload), flush=True)

    out = args.out or os.path.join(repo, "TPU_SMOKE_r02.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(("ALL BRANCHES OK" if report["ok"] else "FAILURES PRESENT"),
          flush=True)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
