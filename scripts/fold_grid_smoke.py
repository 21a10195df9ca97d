"""Chip smoke for the r4 subtree-group-grid fold kernel.

The r4 restructure moved the fold kernel's split mode from an in-cell
2^Ls-subtree unroll to a third grid axis (one subtree group per step, roots
in VMEM scratch) — every branch of that kernel must compile AND match the
CPU oracle on the REAL chip before any sweep trusts it (interpret-mode
parity proves nothing about Mosaic: round-1's broadcast-slice rejection was
only visible on hardware). Also times the compile of each config so the
MAX_SPLIT_BOTTOM wall constant is measured, not guessed.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=... \
      timeout 3600 python scripts/fold_grid_smoke.py > /tmp/fold_smoke.out
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tahoe_tpu.forest import compiler, synthetic
    from tahoe_tpu.ops import oracle
    from tahoe_tpu.ops.fold_kernel import FoldKernelEngine

    interpret = jax.default_backend() == "cpu"
    results = {}

    def out(tag, v):
        results[tag] = v
        print(json.dumps({tag: v}), flush=True)

    # (tag, trees, depth, cols, rows, leaf_prob, engine kwargs)
    CASES = [
        # proven-shape regressions under the new layout
        ("d10_tr16_ls4", 12, 10, 12, 512, 0.1,
         dict(row_tile=64, tree_tile=16, split_level=4)),
        ("d10_tr16_ls5", 12, 10, 12, 512, 0.1,
         dict(row_tile=64, tree_tile=16, split_level=5)),
        # deep dense: the configs the restructure exists for
        ("d12_auto", 100, 12, 28, 512, 0.0, dict(row_tile=64, tree_tile=32)),
        ("d13_auto", 80, 13, 24, 512, 0.0, dict(row_tile=64, tree_tile=16)),
        # Db ladder at depth 14 (compile-wall measurement: Db = 6, 7, 8)
        ("d14_tr8_ls8", 60, 14, 20, 512, 0.0,
         dict(row_tile=64, tree_tile=8, split_level=8)),
        ("d14_tr8_ls7", 60, 14, 20, 512, 0.0,
         dict(row_tile=64, tree_tile=8, split_level=7)),
        ("d14_tr8_ls6", 60, 14, 20, 512, 0.0,
         dict(row_tile=64, tree_tile=8, split_level=6)),
        # depth 15: newly feasible dense
        ("d15_tr4_ls8", 30, 15, 16, 512, 0.0,
         dict(row_tile=64, tree_tile=4, split_level=8)),
        # sign-form (multi-vreg) split: wide forest through the new layout
        ("d8_sign_split", 60, 8, 200, 512, 0.1,
         dict(row_tile=64, tree_tile=32, split_level=3)),
    ]

    for tag, T, D, C, rows, lp, kw in CASES:
        forest = synthetic.generate_forest(T, D, C, leaf_prob=lp, seed=11)
        data = synthetic.generate_data(rows, C, missing_prob=0.05, seed=12)
        want = oracle.predict(forest, data)
        lev = compiler.levelize(forest)
        try:
            t0 = time.perf_counter()
            eng = FoldKernelEngine(lev, interpret=interpret, **kw)
            preds = np.asarray(eng.predict(jnp.asarray(data)))
            compile_s = time.perf_counter() - t0
            err = float(np.abs(preds - want).max())
            out(tag, {"ls": eng.split_level, "err": err,
                      "compile_s": round(compile_s, 1),
                      "ok": bool(err <= 1e-3)})
        except Exception as e:  # noqa: BLE001
            out(tag, f"{type(e).__name__}: {str(e)[:200]}")

    n_ok = sum(1 for v in results.values()
               if isinstance(v, dict) and v.get("ok"))
    print(json.dumps({"summary": f"{n_ok}/{len(CASES)} ok",
                      **{k: v for k, v in results.items()}}), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
