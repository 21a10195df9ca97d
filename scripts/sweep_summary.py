#!/usr/bin/env python
"""Stdlib-only sweep summarizer (no jax/numpy imports — safe to run while a
TPU job holds the tunnel).

Prints the per-family verdict table for a sweep jsonl plus the aggregate
model-accuracy counts the README quotes, de-duplicating by family name
(latest record wins — matches check_sweep_model's latest-per-family rule).

Usage: python scripts/sweep_summary.py sweep_results_r8.jsonl
"""
import json
import sys


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "sweep_results_r8.jsonl"
    latest = {}
    order = []
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        if r["dataset"] not in latest:
            order.append(r["dataset"])
        latest[r["dataset"]] = r

    n_strict = n_w5 = n_parity = 0
    for name in order:
        r = latest[name]
        strat = {k: v for k, v in r["strategies"].items() if v is not None}
        best_v = min(strat.values()) if strat else None
        n_strict += bool(r["model_correct"])
        n_w5 += bool(r["model_within_5pct"])
        n_parity += bool(r["all_correct"])
        rank = r["strategies"].get("RANK_MXU")
        print(f"{name:18s} best={r['measured_best'] or '-':14s}"
              f" {best_v if best_v is not None else float('nan'):8.4f}"
              f" pred={r['predicted']:14s}"
              f" strict={'Y' if r['model_correct'] else 'n'}"
              f" w5={'Y' if r['model_within_5pct'] else 'n'}"
              f" parity={'Y' if r['all_correct'] else 'N'}"
              f" rank={rank if rank is not None else '-'}")
    n = len(order)
    print(f"\n{n} families: parity {n_parity}/{n}, model strict {n_strict}/{n},"
          f" within-5% {n_w5}/{n}")
    return 0 if n_parity == n else 1


if __name__ == "__main__":
    sys.exit(main())
