"""Benchmark: seconds per 1024² 4-step LCM ControlNet edit on one TPU chip.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

Baseline: the reference's headline 6 s/image (SSD-1B fp16 + CPU offload on
an RTX 3060 Laptop, README.md:239 / BASELINE.md).  ``vs_baseline`` is the
speedup factor (baseline_time / our_time).

Runs the full edit path (Canny -> prompt encode -> VAE encode -> fused
ControlNet+UNet+CFG+LCM loop -> VAE decode) with the SSD-1B-architecture
model in bf16, random weights (performance is weight-independent).  The
reference's shipped-config semantics are used: 4 steps at strength 0.8
(=> 3 executed), CFG 1.5, ControlNet scale 0.5.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax

    from PIL import Image

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fastedit_tpu import FastEditor
    from fastedit_tpu.models import configs as C
    from fastedit_tpu.pipeline import stages
    from fastedit_tpu.models.clip import CLIPTextModel
    from fastedit_tpu.models.controlnet import ControlNetModel
    from fastedit_tpu.models.unet import UNet2DConditionModel
    from fastedit_tpu.models.vae import AutoencoderKL
    from fastedit_tpu.text.tokenizer import CLIPTokenizer

    import jax.numpy as jnp

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    # Build the flagship (ssd-1b architecture) editor with random bf16
    # weights — same code path as a converted checkpoint.
    editor = FastEditor.__new__(FastEditor)
    editor.model_name = "ssd-1b"
    editor.config = FastEditor.MODEL_CONFIGS["ssd-1b"]
    editor.dtype = dtype
    editor.use_full_controlnet = False
    editor.resolution = 1024
    editor.device = jax.default_backend()
    editor._control_res = 1024

    unet = UNet2DConditionModel(C.SSD1B_UNET, dtype=dtype, param_dtype=dtype)
    cn = ControlNetModel(C.SDXL_CONTROLNET_SMALL, dtype=dtype, param_dtype=dtype)
    vae = AutoencoderKL(C.SDXL_VAE, dtype=dtype, param_dtype=dtype)
    te1 = CLIPTextModel(C.SDXL_TEXT_ENCODER, dtype=dtype, param_dtype=dtype)
    te2 = CLIPTextModel(C.SDXL_TEXT_ENCODER_2, dtype=dtype, param_dtype=dtype)

    lat = jnp.zeros((1, 128, 128, 4), dtype)
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 77, 2048), dtype)
    pooled = jnp.zeros((1, 1280), dtype)
    tids = jnp.zeros((1, 6))
    cond = jnp.zeros((1, 1024, 1024, 3), dtype)
    ks = jax.random.split(key, 5)
    t0 = time.time()

    def zero_init(init_fn, *args):
        # Shapes via tracing only (no device compile); zero weights — edit
        # latency is weight-value independent.
        shapes = jax.eval_shape(init_fn, *args)["params"]
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    editor.modules = stages.PipelineModules(
        unet=unet,
        controlnet=cn,
        vae=vae,
        text_encoder=te1,
        text_encoder_2=te2,
        unet_params=zero_init(unet.init, ks[0], lat, t, ctx, pooled, tids),
        controlnet_params=zero_init(cn.init, ks[1], lat, t, ctx, pooled, tids, cond),
        vae_params=zero_init(
            vae.init, ks[2], jnp.zeros((1, 1024, 1024, 3), dtype), ks[2]
        ),
        text_encoder_params=zero_init(
            te1.init, ks[3], jnp.zeros((1, 77), jnp.int32)
        ),
        text_encoder_2_params=zero_init(
            te2.init, ks[4], jnp.zeros((1, 77), jnp.int32)
        ),
        vae_scaling_factor=C.SDXL_VAE.scaling_factor,
    )
    editor.tokenizer = CLIPTokenizer.synthetic(vocab_size=C.SDXL_TEXT_ENCODER.vocab_size)
    editor.tokenizer_2 = CLIPTokenizer.synthetic(
        vocab_size=C.SDXL_TEXT_ENCODER_2.vocab_size, pad_token_id=0
    )
    from fastedit_tpu.sched.lcm import LCMSchedulerConfig

    editor.scheduler_config = LCMSchedulerConfig()
    editor.mesh = None
    editor._rebuild_stages()
    editor._prompt_cache = {}
    print(f"[bench] init {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (1024, 1024, 3), dtype=np.uint8))

    # Warmup / compile.
    t0 = time.time()
    editor.edit(img, "a rusty bicycle on a beach", seed=0)
    print(f"[bench] warmup (compile) {time.time()-t0:.1f}s", file=sys.stderr)

    # Steady state: fresh prompt each iter to include prompt encoding.
    iters = 5
    times = []
    for i in range(iters):
        t0 = time.time()
        editor.edit(img, f"a rusty bicycle on a beach {i}", seed=i)
        times.append(time.time() - t0)
    value = float(np.median(times))
    print(f"[bench] per-iter times: {[round(x,3) for x in times]}", file=sys.stderr)

    baseline = 6.0  # s/image, reference headline (BASELINE.md speed table)
    print(
        json.dumps(
            {
                "metric": "seconds_per_1024px_4step_edit",
                "value": round(value, 4),
                "unit": "s",
                "vs_baseline": round(baseline / value, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
