#!/bin/bash
# Scheduling-knob sweep for the rank kernel on the real chip (SUSY-class).
# One subprocess per config (device-cache isolation); serial — the TPU
# tunnel is exclusive. Stderr goes to $OUT.err.
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-/tmp/sched_sweep.jsonl}
: > "$OUT"; : > "$OUT.err"
run() {
  echo "# $*" >> "$OUT"
  echo "=== $*" >> "$OUT.err"
  timeout 480 python -m tahoe_tpu.engine.tile_worker --engine rank \
    --rows 16384 --trees 500 --depth 8 --cols 18 --epochs 16 "$@" \
    >> "$OUT" 2>> "$OUT.err"
}
run --row-tile 256 --tree-tile 64 --cond-lead 1
run --row-tile 256 --tree-tile 128
run --row-tile 512 --tree-tile 64
run --row-tile 256 --tree-tile 64 --col-chunk 2048
run --row-tile 256 --tree-tile 64 --col-chunk 512
run --row-tile 256 --tree-tile 64 --planes
run --row-tile 256 --tree-tile 64 --cond-lead 1 --planes
echo done >> "$OUT"
