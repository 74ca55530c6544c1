#!/usr/bin/env bash
# Full PIE-Bench benchmark workflow — the TPU-native equivalent of the
# reference's run_benchmark_colab.ipynb (clone/install cells dropped; the
# run cells map 1:1).  Reproduces the shipped-results configuration
# (notebook cell 11: ssd-1b, 4 steps, guidance 1.0, control 0.5, canny
# 100/200, seed 42), evaluates (cell 12), renders comparison figures
# (the reference ships figures/comparison_*.png), and archives.
#
# Usage:
#   ./run_benchmark.sh [model] [extra run_batch args...]
#   ./run_benchmark.sh tiny              # weight-free DEMO of the whole
#       artifact chain: auto-generates a synthetic mini-dataset when no
#       PIE-Bench is present, runs the tiny random-weight model, evaluates
#       with --tiny_metrics, and produces the same three artifact kinds
#       (metrics.csv / summary.json / comparison PNGs) the reference ships
#       in results/ + figures/.  Exercised in CI by
#       tests/test_artifact_chain.py (--runslow).
# Env:
#   PIEBENCH_DIR   dataset root (default data/PIE-Bench_v1)
#   OUTPUT_DIR     outputs root (default outputs)
#   RESULTS_DIR    results root (default results)
#   FIGURES_DIR    figures root (default figures)
#   N_FIGURES      comparison figures to render (default 3)
set -euo pipefail

# repo-rooted script paths: callers may run from any cwd (artifacts land
# in the caller's cwd / the *_DIR env roots)
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
# package importable from any cwd (no install step)
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

MODEL="${1:-ssd-1b}"
shift || true
PIEBENCH_DIR="${PIEBENCH_DIR:-data/PIE-Bench_v1}"
OUTPUT_DIR="${OUTPUT_DIR:-outputs}"
RESULTS_DIR="${RESULTS_DIR:-results}"
FIGURES_DIR="${FIGURES_DIR:-figures}"
N_FIGURES="${N_FIGURES:-3}"

MAPPING="$PIEBENCH_DIR/mapping_file.json"
SOURCES="$PIEBENCH_DIR/annotation_images"

EXTRA_EVAL_ARGS=()
if [[ ! -f "$MAPPING" ]]; then
    if [[ "$MODEL" == "tiny" ]]; then
        echo "=== [0/4] No dataset at $PIEBENCH_DIR — generating synthetic demo data"
        python -m fastedit_tpu.tools.make_demo_data \
            --out "$PIEBENCH_DIR" --n 6 --size 64
    else
        echo "PIE-Bench mapping file not found at $MAPPING" >&2
        echo "Place the PIE-Bench_v1 dataset under $PIEBENCH_DIR" >&2
        exit 1
    fi
fi
if [[ "$MODEL" == "tiny" ]]; then
    # random-weight smoke model: learned metric backbones are unavailable
    # and fail-closed; the tiny JAX metric heads keep the chain executable
    EXTRA_EVAL_ARGS+=(--tiny_metrics)
    # the tiny demo chain must never claim a TPU (it may be busy serving
    # the real bench); FASTEDIT_PLATFORM=cpu already pins the batch run
    EXTRA_EVAL_ARGS+=(--device cpu)
fi

echo "=== [1/4] Batch editing ($MODEL) ==="
python "$REPO/run_batch.py" \
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

echo "=== [2/4] Evaluation ==="
python "$REPO/evaluate.py" \
    --mapping_file "$MAPPING" \
    --source_dir "$SOURCES" \
    --outputs_dir "$OUTPUT_DIR/batch/edited/$SUFFIX" \
    --results_file "$RESULTS_DIR/$SUFFIX/metrics.csv" \
    --summary_file "$RESULTS_DIR/$SUFFIX/summary.json" \
    ${EXTRA_EVAL_ARGS[@]+"${EXTRA_EVAL_ARGS[@]}"}

echo "=== [3/4] Comparison figures ==="
python - "$MAPPING" "$N_FIGURES" <<'PY' | while read -r IMAGE_ID; do
import json, sys
mapping = json.load(open(sys.argv[1]))
for image_id in sorted(mapping)[: int(sys.argv[2])]:
    print(image_id)
PY
    python "$REPO/plotting/compare_methods.py" \
        --image_id "$IMAGE_ID" \
        --mapping_file "$MAPPING" \
        --source_dir "$SOURCES" \
        --outputs_dir "$OUTPUT_DIR/batch/edited" \
        --figures_dir "$FIGURES_DIR" \
        --methods "$SUFFIX"
done

echo "=== [4/4] Archive results ==="
tar czf "results_${SUFFIX}.tar.gz" -C "$(dirname "$RESULTS_DIR")" \
    "$(basename "$RESULTS_DIR")/$SUFFIX"
echo "Wrote results_${SUFFIX}.tar.gz"
