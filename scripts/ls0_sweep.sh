#!/bin/bash
# Whole-level (split_level 0) experiments enabled by the 64 MiB Mosaic cap:
# bigger tree tiles at depth 8, and — the big one — whole-level tree-outer
# rank at depth 12/13 (split mode re-streams bottom matrices every row tile;
# whole-level streams them once per predict).
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-/tmp/ls0.jsonl}
: > "$OUT"; : > "$OUT.err"
tw() {
  echo "# $*" >> "$OUT"
  echo "=== $*" >> "$OUT.err"
  timeout 480 python -m tahoe_tpu.engine.tile_worker --engine rank "$@" \
    >> "$OUT" 2>> "$OUT.err"
}
S="--rows 16384 --trees 500 --depth 8 --cols 18 --epochs 16"
tw $S --row-tile 256 --tree-tile 128 --split-level 0 --vmem-fraction 2.5
tw $S --row-tile 256 --tree-tile 128 --split-level 0 --vmem-fraction 2.5 --planes
tw $S --row-tile 512 --tree-tile 64 --split-level 0 --vmem-fraction 2.5
D12="--rows 4096 --trees 100 --depth 12 --cols 28 --epochs 16"
tw $D12 --row-tile 128 --tree-tile 8 --split-level 0 --vmem-fraction 1.4
tw $D12 --row-tile 128 --tree-tile 16 --split-level 0 --vmem-fraction 2.3
tw $D12 --row-tile 128 --tree-tile 8   # auto split (today's control)
D13="--rows 3072 --trees 80 --depth 13 --cols 24 --epochs 16"
tw $D13 --row-tile 64 --tree-tile 8 --split-level 0 --vmem-fraction 1.6
tw $D13 --row-tile 128 --tree-tile 8 --split-level 0 --vmem-fraction 2.5
echo done >> "$OUT"
