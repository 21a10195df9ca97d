#!/bin/bash
# Follow-up: deep13 whole-level with big-enough budgets (G=2 banded matrices)
# + cond_lead on the (256,128) serving path.
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-/tmp/ls0b.jsonl}
: > "$OUT"; : > "$OUT.err"
tw() {
  echo "# $*" >> "$OUT"
  echo "=== $*" >> "$OUT.err"
  timeout 480 python -m tahoe_tpu.engine.tile_worker --engine rank "$@" \
    >> "$OUT" 2>> "$OUT.err"
}
D13="--rows 3072 --trees 80 --depth 13 --cols 24 --epochs 16"
tw $D13 --row-tile 64 --tree-tile 8 --split-level 0 --vmem-fraction 2.3
tw $D13 --row-tile 128 --tree-tile 8 --split-level 0 --vmem-fraction 2.7
tw $D13 --row-tile 128 --tree-tile 8   # auto-split control, same session
S="--rows 16384 --trees 500 --depth 8 --cols 18 --epochs 16"
tw $S --row-tile 256 --tree-tile 128 --split-level 0 --vmem-fraction 2.5 --cond-lead 1 --planes
tw $S --row-tile 256 --tree-tile 128 --split-level 0 --vmem-fraction 2.5 --cond-lead 1
echo done >> "$OUT"
