#!/usr/bin/env bash
# One-command real-weight bring-up (round-1 verdict Next #10).
#
# Run this on the FIRST machine with network egress.  It takes the repo from
# "converter + parity tooling ready" to "parity numbers in hand":
#
#   1. downloads the 9 public weight sources the reference binds
#      (/root/reference/src/pipeline.py:30-43,82-154, src/metrics.py),
#   2. VERIFIES the vendored config fixtures (fastedit_tpu/tools/
#      hf_vendored.py) against the downloaded config.json files — fails
#      loudly on any drift (esp. the reconstructed SSD-1B topology),
#   3. converts every component to fastedit_tpu checkpoints
#      (LCM-LoRA fused offline for SDXL; full LCM UNet for SSD-1B),
#   4. captures + compares golden activations vs the torch reference stack
#      (tools/capture_goldens.py; needs `pip install diffusers torch`),
#   5. runs the 20-image PIE-Bench parity gate (SURVEY.md §4): edit with
#      run_batch.py, evaluate with evaluate.py, and diff the metric means
#      against the reference's shipped results/ CSVs.
#
# Usage:
#   tools/bring_up.sh [WORK_DIR]          # default: ./bring_up
# Env:
#   MODEL=ssd-1b|sdxl (default ssd-1b)    DTYPE=bf16|fp16|fp32 (default bf16)
#   PIE_BENCH_DIR=path to PIE-Bench_v1 (for step 5; skipped if absent)
#   SKIP_GOLDENS=1    skip step 4 (golden capture) even with diffusers
#   SKIP_DOWNLOAD=1   reuse snapshots already under $WORK/snapshots
#                     (resume after a partial run; also how the CI dry-run
#                     executes this script against mocked snapshots —
#                     tests/test_bring_up_dryrun.py)
#   COMPONENTS="unet controlnet vae text metrics tokenizer"
#                     space-separated subset filter for step 3 (default all)
#   CKPT_DIR=path     output checkpoint dir (default ./checkpoints)

set -euo pipefail
cd "$(dirname "$0")/.."
REPO="$PWD"
WORK="${1:-$REPO/bring_up}"
MODEL="${MODEL:-ssd-1b}"
DTYPE="${DTYPE:-bf16}"
COMPONENTS="${COMPONENTS:-unet controlnet vae text metrics tokenizer}"
SNAP="$WORK/snapshots"
CKPT="${CKPT_DIR:-$REPO/checkpoints}"
mkdir -p "$SNAP" "$CKPT"

has() { [[ " $COMPONENTS " == *" $1 "* ]]; }

if [ "${SKIP_DOWNLOAD:-0}" = "1" ]; then
  echo "=== [1/5] SKIP_DOWNLOAD=1 — using existing snapshots under $SNAP"
else
echo "=== [1/5] downloading weight sources -> $SNAP"
python - "$SNAP" <<'PY'
import sys
from huggingface_hub import snapshot_download

snap = sys.argv[1]
SOURCES = {
    # repo_id: allow_patterns
    "stabilityai/stable-diffusion-xl-base-1.0": [
        "unet/*", "text_encoder/*", "text_encoder_2/*",
        "tokenizer/*", "tokenizer_2/*", "scheduler/*", "model_index.json",
    ],
    "segmind/SSD-1B": ["unet/*", "text_encoder/*", "text_encoder_2/*",
                       "tokenizer/*", "tokenizer_2/*", "scheduler/*"],
    "latent-consistency/lcm-ssd-1b": ["*"],
    "latent-consistency/lcm-lora-sdxl": ["*"],
    "diffusers/controlnet-canny-sdxl-1.0-small": ["*"],
    "diffusers/controlnet-canny-sdxl-1.0": ["*"],
    "madebyollin/sdxl-vae-fp16-fix": ["*"],
    "stabilityai/sdxl-vae": ["*"],
    "openai/clip-vit-base-patch16": ["*.json", "*.txt", "*.safetensors"],
}
for repo, patterns in SOURCES.items():
    print(f"  -> {repo}")
    snapshot_download(repo, allow_patterns=patterns,
                      local_dir=f"{snap}/{repo.replace('/', '__')}")
PY

echo "  -> facebook DINO ViT-B/8 (dl.fbaipublicfiles.com)"
curl -sSfL -o "$SNAP/dino_vitbase8_pretrain.pth" \
  https://dl.fbaipublicfiles.com/dino/dino_vitbase8_pretrain/dino_vitbase8_pretrain.pth
echo "  -> torchvision squeezenet1_1 + LPIPS heads"
curl -sSfL -o "$SNAP/squeezenet1_1.pth" \
  https://download.pytorch.org/models/squeezenet1_1-b8a52dc0.pth
curl -sSfL -o "$SNAP/lpips_squeeze_v0.1.pth" \
  https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/master/lpips/weights/v0.1/squeeze.pth
fi

echo "=== [2/5] verifying vendored config fixtures against downloads"
python - "$SNAP" <<'PY'
import json, sys

from fastedit_tpu.tools import hf_config, hf_vendored as V

snap = sys.argv[1]

def load(repo, sub="unet"):
    path = f"{snap}/{repo.replace('/', '__')}/{sub}/config.json" if sub else \
           f"{snap}/{repo.replace('/', '__')}/config.json"
    with open(path) as f:
        return json.load(f)

checks = [
    ("SDXL unet", load("stabilityai/stable-diffusion-xl-base-1.0"),
     V.SDXL_UNET_CONFIG, hf_config.unet_config_from_hf),
    ("SSD-1B unet (RECONSTRUCTED fixture)", load("segmind/SSD-1B"),
     V.SSD1B_UNET_CONFIG, hf_config.unet_config_from_hf),
    ("ControlNet small", load("diffusers/controlnet-canny-sdxl-1.0-small", None),
     V.CONTROLNET_SMALL_CONFIG, hf_config.controlnet_config_from_hf),
    ("ControlNet full", load("diffusers/controlnet-canny-sdxl-1.0", None),
     V.CONTROLNET_FULL_CONFIG, hf_config.controlnet_config_from_hf),
    ("fp16-fix VAE", load("madebyollin/sdxl-vae-fp16-fix", None),
     V.VAE_CONFIG, hf_config.vae_config_from_hf),
]
failed = False
for name, real, vendored, derive in checks:
    # A drifted upstream config can also make derivation itself throw
    # (topology sanity asserts) — report that as drift, not a crash.
    try:
        got = derive(real)
    except Exception as e:
        got = f"<derivation failed: {type(e).__name__}: {e}>"
    want = derive(vendored)
    if got != want:
        failed = True
        print(f"  DRIFT in {name}:\n    real     -> {got}\n    vendored -> {want}")
        print("    => update fastedit_tpu/tools/hf_vendored.py (and configs.py"
              " defaults) to the real values, re-run tests, re-run bench.")
    else:
        print(f"  ok: {name}")
if failed:
    sys.exit(1)

# Capture the REAL config.json contents into the staged fixture so the test
# suite can verify models/configs.py defaults against captured facts forever
# after (tests/test_hf_inventory.py::test_captured_configs_derive_shipped_
# defaults).  CONFIG_GOLDENS_FIXTURE overrides the target (the CI dry-run
# points it at a scratch copy so mocked configs never land in the fixture).
import os

fixture = os.environ.get(
    "CONFIG_GOLDENS_FIXTURE", "tests/fixtures/hf_config_captured.json"
)
cap = json.load(open(fixture)) if os.path.exists(fixture) else {}
cap.update(
    ssd1b_unet=load("segmind/SSD-1B"),
    sdxl_unet=load("stabilityai/stable-diffusion-xl-base-1.0"),
    controlnet_small=load("diffusers/controlnet-canny-sdxl-1.0-small", None),
    controlnet_full=load("diffusers/controlnet-canny-sdxl-1.0", None),
    vae_fp16_fix=load("madebyollin/sdxl-vae-fp16-fix", None),
)
with open(fixture, "w") as f:
    json.dump(cap, f, indent=2)
print(f"  captured real config.json contents -> {fixture}")
PY

echo "=== [3/5] converting components -> $CKPT (COMPONENTS: $COMPONENTS)"
S="$SNAP/stabilityai__stable-diffusion-xl-base-1.0"
CONV="python -m fastedit_tpu.tools.convert_checkpoint"
if has unet; then
  if [ "$MODEL" = "ssd-1b" ]; then
    # reference ssd-1b path: full LCM UNet (latent-consistency/lcm-ssd-1b)
    $CONV unet --src "$SNAP/latent-consistency__lcm-ssd-1b/unet" \
          --out "$CKPT/ssd-1b/unet" --dtype "$DTYPE" --expect ssd-1b
  else
    # reference sdxl path: base UNet + LCM-LoRA fused offline
    LORA=$(ls "$SNAP"/latent-consistency__lcm-lora-sdxl/*.safetensors | head -1)
    $CONV unet --src "$S/unet" --lora "$LORA" \
          --out "$CKPT/sdxl/unet" --dtype "$DTYPE" --expect sdxl
  fi
fi
if has controlnet; then
  $CONV controlnet --src "$SNAP/diffusers__controlnet-canny-sdxl-1.0-small" \
        --out "$CKPT/controlnet-small" --dtype "$DTYPE" --expect controlnet-small
  $CONV controlnet --src "$SNAP/diffusers__controlnet-canny-sdxl-1.0" \
        --out "$CKPT/controlnet-full" --dtype "$DTYPE" --expect controlnet-full
fi
if has vae; then
  $CONV vae --src "$SNAP/madebyollin__sdxl-vae-fp16-fix" \
        --out "$CKPT/vae" --dtype "$DTYPE" --expect vae
  $CONV vae --src "$SNAP/stabilityai__sdxl-vae" \
        --out "$CKPT/vae-fp32" --dtype fp32 --expect vae
fi
if has text; then
  $CONV text_encoder --src "$S/text_encoder" \
        --out "$CKPT/text_encoder" --dtype "$DTYPE"
  $CONV text_encoder_2 --src "$S/text_encoder_2" \
        --out "$CKPT/text_encoder_2" --dtype "$DTYPE"
fi
if has tokenizer; then
  $CONV tokenizer --src "$S/tokenizer" --out "$CKPT/tokenizer"
  $CONV tokenizer --src "$S/tokenizer_2" --out "$CKPT/tokenizer_2"
  # Fill the staged token-id goldens (tests/fixtures/clip_token_goldens.json)
  # from the real vocab, cross-checked against transformers' CLIPTokenizer.
  # TOKEN_GOLDENS_FIXTURE overrides the target (the CI dry-run points it at
  # a scratch copy so mocked-vocab ids never land in the repo fixture).
  python -m fastedit_tpu.tools.capture_token_goldens \
    --tokenizer_dir "$CKPT/tokenizer" \
    --fixture "${TOKEN_GOLDENS_FIXTURE:-tests/fixtures/clip_token_goldens.json}"
fi
if has metrics; then
# metric backbones
B16="$SNAP/openai__clip-vit-base-patch16"
$CONV clip_vision --src "$B16" --out "$CKPT/metrics/clip_vision" --dtype fp32
$CONV clip_text --src "$B16" --out "$CKPT/metrics/clip_text" --dtype fp32
$CONV tokenizer --src "$B16" --out "$CKPT/metrics/clip_tokenizer"
python - "$SNAP" "$CKPT" <<'PY'
# torch .pth sources (DINO / squeezenet+LPIPS) -> converter-friendly dicts
import sys

import numpy as np
import torch

from fastedit_tpu.tools import hf_mapping as M
from fastedit_tpu.utils import checkpoint as ckpt_io

snap, ckpt = sys.argv[1], sys.argv[2]

dino_sd = {k: v.numpy() for k, v in torch.load(
    f"{snap}/dino_vitbase8_pretrain.pth", map_location="cpu").items()}
n_layers = sum(1 for k in dino_sd if k.endswith(".attn.qkv.weight"))
params = M.convert_dino_vit(dino_sd, n_layers, strict=True)
ckpt_io.save_params(f"{ckpt}/metrics/dino", params, dtype=np.float32)
print(f"[convert] dino: {n_layers} layers -> {ckpt}/metrics/dino")

sq = {k: v.numpy() for k, v in torch.load(
    f"{snap}/squeezenet1_1.pth", map_location="cpu").items()}
heads = {k: v.numpy() for k, v in torch.load(
    f"{snap}/lpips_squeeze_v0.1.pth", map_location="cpu").items()}
params = M.convert_lpips_squeeze(sq, heads, strict=True)
ckpt_io.save_params(f"{ckpt}/metrics/lpips", params, dtype=np.float32)
print(f"[convert] lpips -> {ckpt}/metrics/lpips")
PY
fi

echo "=== [4/5] golden activation capture + compare (torch reference stack)"
if [ "${SKIP_GOLDENS:-0}" = "1" ]; then
  echo "  SKIP_GOLDENS=1 — skipping golden capture"
elif python -c "import diffusers" 2>/dev/null; then
  if [ "$MODEL" = "ssd-1b" ]; then
    UNET_SRC="$SNAP/latent-consistency__lcm-ssd-1b/unet"
    UNET_CKPT="$CKPT/ssd-1b/unet"
  else
    # the shipped sdxl checkpoint has LCM-LoRA fused; goldens anchor the
    # BASE unet against a separately converted unfused checkpoint.
    UNET_SRC="$S/unet"
    UNET_CKPT="$CKPT/sdxl/unet-base-golden"
    if has unet; then
      $CONV unet --src "$UNET_SRC" --out "$UNET_CKPT" --dtype "$DTYPE"
    fi
  fi
  declare -A GSRC=(
    [unet]="$UNET_SRC"
    [controlnet]="$SNAP/diffusers__controlnet-canny-sdxl-1.0-small"
    [vae]="$SNAP/madebyollin__sdxl-vae-fp16-fix"
    [text_encoder]="$S/text_encoder"
    [text_encoder_2]="$S/text_encoder_2"
  )
  declare -A GCKPT=(
    [unet]="$UNET_CKPT"
    [controlnet]="$CKPT/controlnet-small"
    [vae]="$CKPT/vae"
    [text_encoder]="$CKPT/text_encoder"
    [text_encoder_2]="$CKPT/text_encoder_2"
  )
  # Which COMPONENTS entry owns each golden kind — a subset run (the
  # COMPONENTS resume workflow) must only compare checkpoints it built.
  declare -A GCOMP=(
    [unet]=unet
    [controlnet]=controlnet
    [vae]=vae
    [text_encoder]=text
    [text_encoder_2]=text
  )
  for kind in unet controlnet vae text_encoder text_encoder_2; do
    if ! has "${GCOMP[$kind]}"; then
      echo "  (skipping $kind goldens — '${GCOMP[$kind]}' not in COMPONENTS)"
      continue
    fi
    python -m fastedit_tpu.tools.capture_goldens capture --kind "$kind" \
      --src "${GSRC[$kind]}" --out "$WORK/goldens/$kind.npz"
    python -m fastedit_tpu.tools.capture_goldens compare --kind "$kind" \
      --golden "$WORK/goldens/$kind.npz" --ckpt "${GCKPT[$kind]}" \
      --precision "$DTYPE"
  done
  # diffusers-LCMScheduler trajectory goldens -> staged fixture
  # (tests/test_lcm_scheduler.py hard-verifies sched/lcm.py once filled)
  python -m fastedit_tpu.tools.capture_scheduler_goldens \
    --scheduler_config "$S/scheduler/scheduler_config.json" \
    --fixture "${SCHED_GOLDENS_FIXTURE:-tests/fixtures/lcm_scheduler_goldens.json}"
else
  echo "  (diffusers not installed — skipping golden capture; run"
  echo "   'pip install diffusers' and re-run this step for activations)"
fi

echo "=== [5/5] 20-image PIE-Bench parity gate"
PIE="${PIE_BENCH_DIR:-$REPO/data/PIE-Bench_v1}"
FULL=1
for c in unet controlnet vae text tokenizer metrics; do
  has "$c" || FULL=0
done
if [ "$FULL" = "0" ]; then
  echo "  (COMPONENTS subset run — parity gate needs every component;"
  echo "   re-run with the full set to execute it)"
elif [ -d "$PIE" ]; then
  python run_batch.py --model "$MODEL" --mapping_file "$PIE/mapping_file.json" \
    --source_dir "$PIE/annotation_images" --output_dir "$WORK/parity" \
    --checkpoint_dir "$CKPT" --num_images 20
  python evaluate.py --mapping_file "$PIE/mapping_file.json" \
    --source_dir "$PIE/annotation_images" \
    --outputs_dir "$WORK/parity/batch/edited/${MODEL}_fp16" \
    --metrics_weights "$CKPT/metrics" \
    --results_file "$WORK/parity/metrics.csv" \
    --summary_file "$WORK/parity/summary.json"
  python - "$WORK" "$MODEL" <<'PY'
import csv, json, statistics, sys

work, model = sys.argv[1], sys.argv[2]
ours = json.load(open(f"{work}/parity/summary.json"))["overall"]
ref_csv = f"/root/reference/results/{model}_fp16/metrics.csv"
try:
    rows = list(csv.DictReader(open(ref_csv)))
except FileNotFoundError:
    print(f"  (no reference results at {ref_csv}; skipping diff)")
    sys.exit(0)
ours_ids = {r["image_id"] for r in csv.DictReader(open(f"{work}/parity/metrics.csv"))}
ref = [r for r in rows if r["image_id"] in ours_ids] or rows[:20]
print(f"  20-image parity vs {ref_csv}:")
ok = True
for m, tol in (("ssim", 0.02), ("clip_score", 0.5), ("psnr", 0.5), ("lpips", 0.02)):
    r = statistics.mean(float(x[m]) for x in ref)
    o = ours[m]["mean"]
    flag = "ok " if abs(o - r) <= tol else "FAIL"
    ok &= flag == "ok "
    print(f"    {flag} {m}: ours={o:.4f} ref={r:.4f} (tol {tol})")
sys.exit(0 if ok else 1)
PY
else
  echo "  (PIE-Bench not found at $PIE — set PIE_BENCH_DIR to run the gate)"
fi

echo "=== bring-up complete"
