#!/bin/bash
# Timing sweep reproduction (reference inference_time.bash, SURVEY.md R15):
# 20 warmup + 80 timed runs per configuration, CSV output. The reference
# swept PyTorch -> ONNX -> TRT32 -> TRT16 per block type; here the sweep is
# batch x precision on the jit path (the TPU deployment path), per backbone
# block type.
set -e

OUT=${1:-timings}
mkdir -p "$OUT"

for BLOCK in nonbottleneck1d basicblock; do
    echo "=== block: $BLOCK ==="
    python inference_time.py \
        --tasks semantic instance orientation scene --enable-panoptic \
        --rgb-encoder-backbone-block "$BLOCK" \
        --depth-encoder-backbone-block "$BLOCK" \
        --n-runs-warmup 20 --n-runs 80 \
        --sweep --csv "$OUT/timings_${BLOCK}.csv"
done
echo "results in $OUT/"
