"""Tile-shape sweep on the real chip: one subprocess per config (the remote
runtime device-caches only the first large executable per process, so every
config gets a fresh process — see engine/bench_worker.py).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tile_sweep.py \
      --engine rank --rows 16384 4096 --row-tiles 128 256 512 \
      --tree-tiles 16 32 64 -o /tmp/sweep.jsonl
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--engine", choices=["fold", "rank"], required=True)
    p.add_argument("--rows", type=int, nargs="+", default=[16384])
    p.add_argument("--row-tiles", type=int, nargs="+", default=[128, 256, 512])
    p.add_argument("--tree-tiles", type=int, nargs="+", default=[32, 64])
    p.add_argument("--split-levels", type=int, nargs="+", default=[None],
                   help="subtree split levels to sweep (default: engine auto)")
    p.add_argument("--trees", type=int, default=500)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--cols", type=int, default=18)
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--timeout", type=int, default=240)
    p.add_argument("-o", "--out", default=None)
    args = p.parse_args()

    results = []
    for rows in args.rows:
        for rt in args.row_tiles:
            for tt in args.tree_tiles:
              for ls in args.split_levels:
                cmd = [
                    sys.executable, "-m", "tahoe_tpu.engine.tile_worker",
                    "--engine", args.engine, "--rows", str(rows),
                    "--row-tile", str(rt), "--tree-tile", str(tt),
                    "--trees", str(args.trees), "--depth", str(args.depth),
                    "--cols", str(args.cols), "--epochs", str(args.epochs),
                ]
                if ls is not None:
                    cmd += ["--split-level", str(ls)]
                try:
                    out = subprocess.run(
                        cmd, capture_output=True, text=True,
                        timeout=args.timeout, env=os.environ.copy(),
                    )
                    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
                    rec = json.loads(line) if line.startswith("{") else {
                        "error": (out.stderr or "no output")[-400:]}
                except subprocess.TimeoutExpired:
                    rec = {"error": "timeout"}
                rec.setdefault("engine", args.engine)
                rec.setdefault("rows", rows)
                rec.setdefault("row_tile", rt)
                rec.setdefault("tree_tile", tt)
                results.append(rec)
                print(json.dumps(rec), flush=True)

    ok = [r for r in results if "us_per_sample" in r and r.get("correct")]
    if ok:
        best = min(ok, key=lambda r: r["us_per_sample"])
        print("# best:", json.dumps(best), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
