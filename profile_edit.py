"""Per-stage latency breakdown of a full edit on the real chip.

Uses the same flagship setup as bench.py but times each device program
separately (relay-safe sync), so optimization work targets the right stage.

Usage: python profile_edit.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    import bench  # reuse the flagship-editor builder below

    # Rebuild the same zero-weight flagship editor bench.py uses, but keep a
    # handle on the pieces.
    from fastedit_tpu.models import configs as C
    from fastedit_tpu.pipeline import stages
    from fastedit_tpu.sched.lcm import LCMSchedulerConfig, make_schedule
    from fastedit_tpu.utils.image import pil_to_float, resize
    from fastedit_tpu.utils.profiling import StageTimer, sync

    # --- build editor (borrow bench construction via a tiny shim) ---------
    import io
    import contextlib

    editor_holder = {}

    real_median = np.median

    def fake_median(x):
        editor_holder["times"] = x
        return real_median(x)

    # Cheaper: replicate bench's builder inline.
    from fastedit_tpu.pipeline.editor import FastEditor
    from fastedit_tpu.models.clip import CLIPTextModel
    from fastedit_tpu.models.controlnet import ControlNetModel
    from fastedit_tpu.models.unet import UNet2DConditionModel
    from fastedit_tpu.models.vae import AutoencoderKL
    from fastedit_tpu.text.tokenizer import CLIPTokenizer

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
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
    t0_ = jnp.zeros((1,))
    ctx = jnp.zeros((1, 77, 2048), dtype)
    pooled = jnp.zeros((1, 1280), dtype)
    tids = jnp.zeros((1, 6))
    cond = jnp.zeros((1, 1024, 1024, 3), dtype)
    ks = jax.random.split(key, 5)

    def zero_init(init_fn, *args):
        shapes = jax.eval_shape(init_fn, *args)["params"]
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    editor.modules = stages.PipelineModules(
        unet=unet, controlnet=cn, vae=vae, text_encoder=te1, text_encoder_2=te2,
        unet_params=zero_init(unet.init, ks[0], lat, t0_, ctx, pooled, tids),
        controlnet_params=zero_init(cn.init, ks[1], lat, t0_, ctx, pooled, tids, cond),
        vae_params=zero_init(vae.init, ks[2], jnp.zeros((1, 1024, 1024, 3), dtype), ks[2]),
        text_encoder_params=zero_init(te1.init, ks[3], jnp.zeros((1, 77), jnp.int32)),
        text_encoder_2_params=zero_init(te2.init, ks[4], jnp.zeros((1, 77), jnp.int32)),
        vae_scaling_factor=C.SDXL_VAE.scaling_factor,
    )
    editor.tokenizer = CLIPTokenizer.synthetic(vocab_size=C.SDXL_TEXT_ENCODER.vocab_size)
    editor.tokenizer_2 = CLIPTokenizer.synthetic(
        vocab_size=C.SDXL_TEXT_ENCODER_2.vocab_size, pad_token_id=0
    )
    editor.scheduler_config = LCMSchedulerConfig()
    editor.mesh = None
    editor._rebuild_stages()
    editor._prompt_cache = {}

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (1024, 1024, 3), dtype=np.uint8))
    print("[profile] compiling...", file=sys.stderr)
    editor.edit(img, "warmup", seed=0)
    print("[profile] compiled; profiling 3 rounds", file=sys.stderr)

    timer = StageTimer()
    for i in range(3):
        prompt = f"a rusty bicycle {i}"
        with timer.stage("host: resize+tofloat") as out:
            input_image = resize(img.convert("RGB"), 1024)
            img01 = pil_to_float(input_image)
        with timer.stage("h2d+canny") as out:
            arr = jnp.asarray(img01 * 255.0)
            edges = editor._canny(arr, 100.0, 200.0)
            out["result"] = edges
        with timer.stage("control prep") as out:
            control = (jnp.stack([edges] * 3, axis=-1).astype(jnp.float32)[None] / 255.0)
            out["result"] = control
        with timer.stage("encode_prompt") as out:
            ids1 = jnp.asarray(editor.tokenizer.encode(prompt))[None]
            ids2 = jnp.asarray(editor.tokenizer_2.encode(prompt))[None]
            ctx_c, pooled_c = editor._encode_prompt(ids1, ids2)
            ids1n = jnp.asarray(editor.tokenizer.encode(""))[None]
            ids2n = jnp.asarray(editor.tokenizer_2.encode(""))[None]
            ctx_u, pooled_u = editor._encode_prompt(ids1n, ids2n)
            out["result"] = (ctx_c, ctx_u)
        context = jnp.concatenate([ctx_u, ctx_c])
        pooled2 = jnp.concatenate([pooled_u, pooled_c])
        time_ids = stages.make_sdxl_time_ids(2, 1024)
        k = jax.random.PRNGKey(i)
        k, k_enc, k_loop = jax.random.split(k, 3)
        with timer.stage("h2d image + vae_encode") as out:
            image_in = jnp.asarray(img01 * 2.0 - 1.0, dtype=dtype)[None]
            latents = editor._vae_encode(image_in, k_enc)
            out["result"] = latents
        schedule = make_schedule(editor.scheduler_config, 4, strength=0.8)
        with timer.stage("denoise x3 (CFG)") as out:
            latents = editor._denoise(
                latents, context, pooled2, time_ids, control.astype(dtype),
                schedule, jnp.float32(1.5), jnp.float32(0.5), k_loop, do_cfg=True,
            )
            out["result"] = latents
        with timer.stage("vae_decode") as out:
            out_img = editor._vae_decode(latents)
            out["result"] = out_img
        with timer.stage("d2h + topil") as out:
            arr_out = np.asarray(out_img[0])
            _ = (arr_out * 255 + 0.5).astype(np.uint8)
    print(timer.report())


if __name__ == "__main__":
    main()
