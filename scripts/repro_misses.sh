#!/bin/bash
# Reproduce the sweep-r3 runtime errors (strategies that measured None while
# feasibility said OK) + measure the chunk_lead variant. Serial on the chip.
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-/tmp/repro.jsonl}
: > "$OUT"; : > "$OUT.err"
bw() {
  echo "# bench_worker $*" >> "$OUT"
  echo "=== $*" >> "$OUT.err"
  timeout 480 python -m tahoe_tpu.engine.bench_worker "$@" >> "$OUT" 2>> "$OUT.err"
}
tw() {
  echo "# tile_worker $*" >> "$OUT"
  echo "=== $*" >> "$OUT.err"
  timeout 480 python -m tahoe_tpu.engine.tile_worker "$@" >> "$OUT" 2>> "$OUT.err"
}
tw --engine rank --rows 16384 --trees 500 --depth 8 --cols 18 --epochs 16 \
   --row-tile 256 --tree-tile 64 --chunk-lead 1
tw --engine rank --rows 16384 --trees 500 --depth 8 --cols 18 --epochs 16 \
   --row-tile 256 --tree-tile 64 --chunk-lead 1 --planes
bw /tmp/repro/letter.npz /tmp/repro/letter_data.npy VMEM_FOREST 2 8
bw /tmp/repro/covtype.npz /tmp/repro/covtype_data.npy VMEM_FOREST 2 8
bw /tmp/repro/deep12.npz /tmp/repro/deep12_data.npy RANK_MXU 2 8
bw /tmp/repro/deep15.npz /tmp/repro/deep15_data.npy SPLIT_FOREST 2 8
echo done >> "$OUT"
