#!/bin/bash
# Post-r4 batch: last SUSY tile experiments + trained-forest drive.
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-/tmp/post_sweep.jsonl}
: > "$OUT"; : > "$OUT.err"
tw() {
  echo "# $*" >> "$OUT"
  echo "=== $*" >> "$OUT.err"
  timeout 480 python -m tahoe_tpu.engine.tile_worker --engine rank "$@" \
    >> "$OUT" 2>> "$OUT.err"
}
S="--rows 16384 --trees 500 --depth 8 --cols 18 --epochs 16"
tw $S --row-tile 512 --tree-tile 128 --split-level 0 --vmem-fraction 1.0
tw $S --row-tile 256 --tree-tile 128 --split-level 0 --col-chunk 2048 --vmem-fraction 1.0
tw $S --row-tile 512 --tree-tile 128 --split-level 0 --vmem-fraction 1.0 --planes
# larger batches amortize fixed dispatch + transform setup (the reference
# times 2.2M-row SUSY, BaseTahoeTest.h:684-698)
B="--trees 500 --depth 8 --cols 18 --epochs 10"
tw $B --rows 65536 --row-tile 256 --tree-tile 128 --split-level 0 --vmem-fraction 1.0
tw $B --rows 65536 --row-tile 256 --tree-tile 128 --split-level 0 --vmem-fraction 1.0 --planes
echo done >> "$OUT"
