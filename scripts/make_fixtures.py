#!/usr/bin/env python
"""Generate model/data fixture pairs in the reference text formats.

The reference's 15 datasets are downloaded from Google Drive at test time
(run_all_15_examples.sh); this environment has no egress, so fixtures are
synthesized with the same format and shape families (scripts/run_sweep.py
SHAPES). Usage:

  python scripts/make_fixtures.py fixtures/ --shape susy_like --rows 2000
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    from run_sweep import SHAPES

    from tahoe_tpu.forest import io, synthetic

    p = argparse.ArgumentParser()
    p.add_argument("outdir")
    p.add_argument("--shape", default="susy_like",
                   choices=[s[0] for s in SHAPES])
    p.add_argument("--rows", type=int, default=None)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    name, trees, depth, cols, rows, mprob = next(
        s for s in SHAPES if s[0] == args.shape
    )
    rows = args.rows or rows
    os.makedirs(args.outdir, exist_ok=True)
    if name.startswith("trained_mix"):
        forest = synthetic.generate_mixed_depth_forest(trees, depth, cols,
                                                       seed=args.seed)
    elif name.startswith("rf_trained"):
        from tahoe_tpu.forest.train import train_forest

        forest = train_forest(trees, depth, cols, rows=2048, seed=args.seed)
    else:
        forest = synthetic.generate_forest(trees, depth, cols, seed=args.seed)
    data = synthetic.generate_data(rows, cols, missing_prob=mprob,
                                   seed=args.seed + 1)
    mp = os.path.join(args.outdir, f"model_{name}.txt")
    dp = os.path.join(args.outdir, f"data_{name}.txt")
    io.save_model(mp, forest)
    io.save_data(dp, data, missing=forest.missing)
    print(f"wrote {mp} ({trees} trees depth {depth}) and {dp} ({rows} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
