#!/usr/bin/env python
"""Replace per-dataset records in a sweep jsonl with fresher ones.

Usage: python scripts/splice_sweep.py BASE.jsonl FIXUP.jsonl
Records in FIXUP replace same-dataset records in BASE (in place); the
summary line counts are reprinted.
"""
import json
import sys


def main() -> int:
    base_path, fix_path = sys.argv[1], sys.argv[2]
    fresh = {}
    with open(fix_path) as f:
        for line in f:
            if line.strip():
                d = json.loads(line)
                fresh[d["dataset"]] = d
    out = []
    with open(base_path) as f:
        for line in f:
            if line.strip():
                d = json.loads(line)
                out.append(fresh.pop(d["dataset"], d))
    out.extend(fresh.values())
    with open(base_path, "w") as f:
        for d in out:
            f.write(json.dumps(d) + "\n")
    n_ok = sum(d["all_correct"] for d in out)
    n_pred = sum(d["model_correct"] for d in out)
    n_w5 = sum(d.get("model_within_5pct", d["model_correct"]) for d in out)
    print(f"{len(out)} datasets, {n_ok} fully correct, model strict "
          f"{n_pred}/{len(out)}, within-5% {n_w5}/{len(out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
