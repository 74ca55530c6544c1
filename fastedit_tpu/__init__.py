"""fastedit_tpu — TPU-native fast image editing with generative models.

A from-scratch JAX / XLA / Pallas framework with the capabilities of the
reference repo `vismaychuriwala/Fast-Image-Editing-with-Generative-Models`:
text-guided 4-step LCM image *editing* (SDXL / SSD-1B + ControlNet-Canny
img2img), PIE-Bench batch evaluation with six metrics, and comparison
plotting — rebuilt TPU-first.

Layer map (mirrors SURVEY.md §7):
    ops/       Pallas TPU kernels (flash attention, fused GroupNorm+SiLU)
               with pure-XLA fallbacks, plus the JAX Canny edge detector.
    models/    Flax (linen) model zoo: UNet2DCondition (SDXL + SSD-1B
               topologies from one config-driven class), ControlNet,
               AutoencoderKL, CLIP text/vision towers.  NHWC layout, bf16.
    sched/     LCM scheduler as pure functions / precomputed tables.
    pipeline/  `FastEditor` facade (API-compatible with the reference's
               src/pipeline.py:17-293) composing jitted stages.
    parallel/  Mesh construction + NamedSharding rules; data-parallel
               PIE-Bench batch runner over ICI.
    metrics/   SSIM/PSNR/MSE (pure JAX), LPIPS-SqueezeNet, CLIPScore and
               DINO ViT distance as Flax models (reference: src/metrics.py).
    text/      Pure-Python CLIP BPE tokenizer (no network, no HF hub).
    tools/     HF-safetensors -> framework checkpoint converter (incl.
               LCM-LoRA fusion for the SDXL path), golden-capture utils.
    utils/     Image I/O and host-side helpers.

The reference's public API surface (`FastEditor`, `MetricsCalculator`,
re-exported at reference src/__init__.py:5-7) is preserved here.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("FASTEDIT_PLATFORM"):
    # Honor an explicit platform choice (e.g. FASTEDIT_PLATFORM=cpu for
    # smoke runs).  Must go through jax.config — this image's sitecustomize
    # overrides the plain JAX_PLATFORMS env var.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["FASTEDIT_PLATFORM"])

__all__ = ["FastEditor", "MetricsCalculator", "__version__"]


def __getattr__(name):  # lazy: keep `import fastedit_tpu.sched` light
    if name == "FastEditor":
        from fastedit_tpu.pipeline.editor import FastEditor

        return FastEditor
    if name == "MetricsCalculator":
        from fastedit_tpu.metrics.calculator import MetricsCalculator

        return MetricsCalculator
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
