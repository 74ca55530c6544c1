#!/usr/bin/env bash
# Full PIE-Bench benchmark workflow — the TPU-native equivalent of the
# reference's run_benchmark_colab.ipynb (clone/install cells dropped; the
# run cells map 1:1).  Reproduces the shipped-results configuration
# (notebook cell 11: ssd-1b, 4 steps, guidance 1.0, control 0.5, canny
# 100/200, seed 42) and then evaluates (cell 12).
#
# Usage:
#   ./run_benchmark.sh [model] [extra run_batch args...]
# Env:
#   PIEBENCH_DIR   dataset root (default data/PIE-Bench_v1)
#   OUTPUT_DIR     outputs root (default outputs)
set -euo pipefail

MODEL="${1:-ssd-1b}"
shift || true
PIEBENCH_DIR="${PIEBENCH_DIR:-data/PIE-Bench_v1}"
OUTPUT_DIR="${OUTPUT_DIR:-outputs}"

MAPPING="$PIEBENCH_DIR/mapping_file.json"
SOURCES="$PIEBENCH_DIR/annotation_images"

if [[ ! -f "$MAPPING" ]]; then
    echo "PIE-Bench mapping file not found at $MAPPING" >&2
    echo "Place the PIE-Bench_v1 dataset under $PIEBENCH_DIR" >&2
    exit 1
fi

echo "=== [1/3] Batch editing ($MODEL) ==="
python run_batch.py \
    --mapping_file "$MAPPING" \
    --source_dir "$SOURCES" \
    --output_dir "$OUTPUT_DIR" \
    --model "$MODEL" \
    --steps 4 --guidance 1.0 --control_scale 0.5 \
    --canny_low 100 --canny_high 200 --seed 42 \
    --skip_existing --save_comparisons \
    "$@"

SUFFIX="${MODEL}_fp16"
for arg in "$@"; do
    [[ "$arg" == "--full_precision" || "$arg" == "--quality_mode" ]] && SUFFIX="${MODEL}_fp32"
done

echo "=== [2/3] Evaluation ==="
python evaluate.py \
    --mapping_file "$MAPPING" \
    --source_dir "$SOURCES" \
    --outputs_dir "$OUTPUT_DIR/batch/edited/$SUFFIX"

echo "=== [3/3] Archive results ==="
tar czf "results_${SUFFIX}.tar.gz" "results/$SUFFIX"
echo "Wrote results_${SUFFIX}.tar.gz"
