#!/usr/bin/env python
"""Dedicated rf_deep16_like sweep record (SPARSE showcase).

Full enumeration over every dense strategy is pointless at depth 16 — they
are all infeasible or pathologically slow (HBM gather ~minutes of wall per
slope chain; rank/bucketed table builds explode on the complete-tree form).
This driver enumerates the strategies that can actually serve the shape
(SPARSE; DEPTH_BUCKETED optionally), records the dense tiers' skip reasons
from feasibility, and appends a run_sweep-schema record to the r5 jsonl.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/rf16_record.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--out", default="sweep_results_r5.jsonl")
    p.add_argument("--run", nargs="*", default=["SPARSE"],
                   help="strategies to actually measure")
    args = p.parse_args()

    from tahoe_tpu.config import Strategy
    from tahoe_tpu.engine import autotune, feasibility
    from tahoe_tpu.forest import synthetic
    from tahoe_tpu.forest.train import train_forest
    from tahoe_tpu.perf_model import calibrate, model

    trees, depth, cols, rows = 120, 16, 20, 1500
    spec = train_forest(trees, depth, cols, rows=2048, seed=1)
    data = synthetic.generate_data(rows, cols, missing_prob=0.0, seed=2)
    print(f"=== rf_deep16_like: {spec.num_trees} trees depth {spec.depth} "
          f"{spec.num_cols} cols, {rows} rows", flush=True)

    cal = calibrate.Calibration.default()
    predicted, _ = model.choose_strategy(spec, rows, cal)
    run = tuple(Strategy[s] for s in args.run)

    t0 = time.perf_counter()
    res = autotune.enumerate_strategies(
        spec, data, strategies=run, warmup=2, epochs=args.epochs,
    )
    best = autotune.best_strategy(res)

    strategies = {}
    not_run = {}
    for s in Strategy:
        if s in res:
            r = res[s]
            strategies[s.name] = (None if not r.ran
                                  else round(r.us_per_sample, 6))
            if not r.ran:
                not_run[s.name] = r.skipped_reason or r.error
        else:
            reason = feasibility.check(s, spec)
            strategies[s.name] = None
            not_run[s.name] = reason or (
                "not measured: complete-tree table build / gather descent "
                "takes minutes of wall at depth 16 (enumeration timeout)"
            )

    best_r = res.get(best) if best else None
    pred_r = res.get(predicted)
    within = bool(pred_r is not None and pred_r.ran and best_r is not None
                  and pred_r.us_per_sample <= best_r.us_per_sample * 1.05)
    rec = {
        "dataset": "rf_deep16_like",
        "trees": spec.num_trees, "depth": spec.depth, "cols": spec.num_cols,
        "rows": rows,
        "predicted": predicted.name,
        "measured_best": best.name if best else None,
        "model_correct": bool(best == predicted),
        "model_within_5pct": bool(best == predicted) or within,
        "all_correct": all(r.correct for r in res.values() if r.ran),
        "strategies": strategies,
        "not_run": not_run,
        "wall_s": round(time.perf_counter() - t0, 1),
        "note": "dense tiers recorded by feasibility/timeout reason; "
                "see scripts/rf16_record.py",
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
