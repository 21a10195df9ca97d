#!/usr/bin/env python
"""Focused sweep record for one family: measure only the decisive strategies.

Full enumeration re-measures strategies whose numbers r4 already pinned and
whose wall cost at deep shapes is minutes each (XLA compile + slope chains).
This driver measures the named strategies, carries prior-round numbers for
the rest (tagged), and appends a run_sweep-schema record.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/family_record.py \
      --family deep14_like --run SPLIT_FOREST RANK_MXU SPARSE \
      --carry sweep_results_r4.jsonl
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
    p.add_argument("--family", required=True)
    p.add_argument("--run", nargs="+", required=True)
    p.add_argument("--carry", default=None,
                   help="prior jsonl whose numbers fill unmeasured strategies")
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--out", default="sweep_results_r5.jsonl")
    args = p.parse_args()

    from tahoe_tpu.config import Strategy
    from tahoe_tpu.engine import autotune, feasibility
    from tahoe_tpu.forest import synthetic
    from tahoe_tpu.perf_model import calibrate, model

    import importlib.util

    _rs = importlib.util.spec_from_file_location(
        "run_sweep", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "run_sweep.py"))
    run_sweep = importlib.util.module_from_spec(_rs)
    _rs.loader.exec_module(run_sweep)
    SHAPES = run_sweep.SHAPES

    shape = next(s for s in SHAPES if s[0] == args.family)
    name, trees, depth, cols, rows, mprob = shape[:6]
    extra = shape[6] if len(shape) > 6 else {}
    if name.startswith("trained_mix"):
        spec = synthetic.generate_mixed_depth_forest(trees, depth, cols, seed=1)
    elif name.startswith("rf_"):
        from tahoe_tpu.forest.train import train_forest

        spec = train_forest(trees, depth, cols, rows=2048, seed=1)
    else:
        spec = synthetic.generate_forest(trees, depth, cols, seed=1,
                                         active_cols=extra.get("active"))
    data = synthetic.generate_data(rows, cols, missing_prob=mprob, seed=2)
    print(f"=== {name}: {spec.num_trees} trees depth {spec.depth} "
          f"{spec.num_cols} cols, {rows} rows", flush=True)

    carry = {}
    if args.carry and os.path.exists(args.carry):
        for line in open(args.carry):
            r = json.loads(line)
            if r.get("dataset") == name:
                carry = r.get("strategies", {})

    cal = calibrate.Calibration.default()
    predicted, _ = model.choose_strategy(spec, rows, cal)
    run = tuple(Strategy[s] for s in args.run)

    t0 = time.perf_counter()
    res = autotune.enumerate_strategies(
        spec, data, strategies=run, warmup=2, epochs=args.epochs,
    )

    strategies = {}
    not_run = {}
    carried = []
    for s in Strategy:
        if s in res and (res[s].ran or carry.get(s.name) is None):
            r = res[s]
            strategies[s.name] = (None if not r.ran
                                  else round(r.us_per_sample, 6))
            if not r.ran:
                not_run[s.name] = r.skipped_reason or r.error
        elif carry.get(s.name) is not None:
            strategies[s.name] = carry[s.name]
            carried.append(s.name)
        else:
            reason = feasibility.check(s, spec)
            strategies[s.name] = None
            not_run[s.name] = reason or "not measured this round"

    # best over measured + carried
    best_name = min(
        (k for k, v in strategies.items() if v is not None),
        key=lambda k: strategies[k], default=None,
    )
    best = Strategy[best_name] if best_name else None
    pred_v = strategies.get(predicted.name)
    best_v = strategies.get(best_name) if best_name else None
    within = bool(pred_v is not None and best_v is not None
                  and pred_v <= best_v * 1.05)
    rec = {
        "dataset": name,
        "trees": spec.num_trees, "depth": spec.depth, "cols": spec.num_cols,
        "rows": rows,
        "predicted": predicted.name,
        "measured_best": best_name,
        "model_correct": bool(best == predicted),
        "model_within_5pct": bool(best == predicted) or within,
        "all_correct": all(r.correct for r in res.values() if r.ran),
        "strategies": strategies,
        "not_run": not_run,
        "carried_from_prior_round": carried,
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
