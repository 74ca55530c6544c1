"""Jitted pipeline stages: prompt encode / VAE encode / denoise loop / decode.

TPU-native replacement for the diffusers SDXL-ControlNet-Img2Img call the
reference makes at src/pipeline.py:261-272 (SURVEY.md §2.2 E1).  Each stage
is one XLA program; the whole 4-step ControlNet+UNet+CFG+LCM hot loop
compiles into a single ``lax.fori_loop`` — no host round-trips between steps.

Params are explicit arguments (never closure-captured) so the multi-GB
weight trees stay XLA *parameters*, not embedded constants, and the same
compiled program serves every edit.

Semantics mirrored from the external pipeline (behavior spec, not a port):
  * dual-tower prompt encoding; context = concat(penultimate states),
    pooled = tower-2 projected pooled embedding.
  * classifier-free guidance with a 2x batch (uncond first) when
    guidance_scale > 1, skipped entirely at <= 1 (trace-time decision,
    matching diffusers' ``do_classifier_free_guidance``).
  * VAE encode -> x scaling_factor; strength-truncated initial noising;
    per-step fresh noise injection (LCM); decode -> [0, 1] images.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from fastedit_tpu.models.clip import CLIPTextModel
from fastedit_tpu.models.controlnet import ControlNetModel
from fastedit_tpu.models.unet import UNet2DConditionModel
from fastedit_tpu.models.vae import AutoencoderKL
from fastedit_tpu.sched.lcm import LCMSchedule, add_noise, lcm_step


@dataclasses.dataclass
class PipelineModules:
    """Model definitions + params for one editor instance."""

    unet: UNet2DConditionModel
    controlnet: ControlNetModel
    vae: AutoencoderKL
    text_encoder: CLIPTextModel
    text_encoder_2: CLIPTextModel
    unet_params: Any
    controlnet_params: Any
    vae_params: Any
    text_encoder_params: Any
    text_encoder_2_params: Any
    vae_scaling_factor: float

    @property
    def denoiser_params(self):
        return {"unet": self.unet_params, "controlnet": self.controlnet_params}


def make_encode_prompt(mod: PipelineModules):
    te1, te2 = mod.text_encoder, mod.text_encoder_2

    @jax.jit
    def encode_prompt(params, ids_1: jax.Array, ids_2: jax.Array):
        """[B, 77] x2 token ids -> (context [B, 77, D1+D2], pooled [B, P])."""
        out1 = te1.apply({"params": params["te1"]}, ids_1)
        out2 = te2.apply({"params": params["te2"]}, ids_2)
        context = jnp.concatenate(
            [out1.penultimate_hidden_state, out2.penultimate_hidden_state], axis=-1
        )
        return context, out2.pooled_output

    return partial(
        encode_prompt,
        {"te1": mod.text_encoder_params, "te2": mod.text_encoder_2_params},
    )


def make_vae_encode(mod: PipelineModules):
    vae, scale = mod.vae, mod.vae_scaling_factor

    @partial(jax.jit, static_argnames=("tile_noise",))
    def vae_encode(
        params, image: jax.Array, key: jax.Array, tile_noise: bool = False
    ) -> jax.Array:
        """image [B, H, W, 3] in [-1, 1] -> scaled latents [B, h, w, 4]."""
        mean, logvar = vae.apply(
            {"params": params}, image, method=vae.encode_moments
        )
        if tile_noise:
            # same posterior noise for every batch element (fixed-seed batch
            # parity with the reference's per-image same-seed loop).
            eps = jax.random.normal(key, (1, *mean.shape[1:]), dtype=jnp.float32)
            logv = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
            z = mean.astype(jnp.float32) + jnp.exp(0.5 * logv) * eps
            z = z.astype(mean.dtype)
        else:
            z = AutoencoderKL.sample(mean, logvar, key)
        return z * scale

    return partial(vae_encode, mod.vae_params)


def make_vae_decode(mod: PipelineModules):
    vae, scale = mod.vae, mod.vae_scaling_factor

    @jax.jit
    def vae_decode(params, latents: jax.Array) -> jax.Array:
        """scaled latents -> uint8 image [B, H, W, 3].

        Quantization happens on device (PIL round-half-up semantics) so the
        device->host transfer is uint8 (4x smaller through the tunnel).
        """
        img = vae.apply({"params": params}, latents / scale, method=vae.decode)
        img01 = jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
        return (img01 * 255.0 + 0.5).astype(jnp.uint8)

    return partial(vae_decode, mod.vae_params)


def make_prepare_inputs(mod: PipelineModules, control_res: int):
    """uint8 source image -> (canny control image, normalized VAE input).

    One jitted program per edit for all pixel preprocessing: the host sends
    3 MB of uint8 instead of 2x12 MB of fp32.
    """
    from fastedit_tpu.ops.canny import canny_jax

    dtype = mod.unet.dtype

    def prepare_one(img_u8: jax.Array, low: jax.Array, high: jax.Array):
        f = img_u8.astype(jnp.float32)  # [H, W, 3] in [0, 255]
        edges = canny_jax(f, low, high)  # [H, W] uint8 {0, 255}
        control = jnp.stack([edges] * 3, axis=-1).astype(jnp.float32) / 255.0
        if control_res != control.shape[0]:
            control = jax.image.resize(
                control, (control_res, control_res, 3), "nearest"
            )
        vae_in = (f / 127.5 - 1.0).astype(dtype)
        return control.astype(dtype), vae_in

    @jax.jit
    def prepare(img_u8, low, high):
        control, vae_in = prepare_one(img_u8, low, high)
        return control[None], vae_in[None]

    prepare_batch = jax.jit(jax.vmap(prepare_one, in_axes=(0, None, None)))
    return prepare, prepare_batch


def make_denoise(mod: PipelineModules):
    """Build the fused ControlNet+UNet+CFG+LCM denoising program.

    ``do_cfg`` is static: with CFG the models run on a 2B batch
    [uncond; cond] exactly once per step.
    """
    unet, controlnet = mod.unet, mod.controlnet

    @partial(
        jax.jit, static_argnames=("do_cfg", "tile_noise"), donate_argnums=(1,)
    )
    def denoise(
        params,
        latents: jax.Array,  # [B, h, w, 4] *clean* scaled latents
        context: jax.Array,  # [B or 2B, 77, D] (uncond first if CFG)
        pooled: jax.Array,  # [B or 2B, P]
        time_ids: jax.Array,  # [B or 2B, 6]
        control_image: jax.Array,  # [B, H, W, 3] in [0, 1]
        schedule: LCMSchedule,
        guidance_scale: jax.Array,
        controlnet_scale: jax.Array,
        key: jax.Array,
        do_cfg: bool,
        tile_noise: bool = False,
    ) -> jax.Array:
        b = latents.shape[0]
        if do_cfg:
            assert context.shape[0] == 2 * b, "CFG expects [uncond; cond] context"
        cond_in = (
            jnp.concatenate([control_image, control_image]) if do_cfg else control_image
        )

        def draw_noise(k):
            # tile_noise: every image in the batch gets the SAME noise — what
            # the reference's fixed-seed batch loop produces (a fresh
            # same-seeded generator per image, run_batch.py:208-219).
            if tile_noise:
                n = jax.random.normal(
                    k, (1, *latents.shape[1:]), dtype=jnp.float32
                )
                return jnp.broadcast_to(n, latents.shape)
            return jax.random.normal(k, latents.shape, dtype=jnp.float32)

        key, k_init = jax.random.split(key)
        lat = add_noise(schedule, latents.astype(jnp.float32), draw_noise(k_init))
        lat = lat.astype(latents.dtype)

        def body(i, carry):
            lat, key = carry
            key, k_step = jax.random.split(key)
            t = jnp.broadcast_to(schedule.timesteps[i], (lat.shape[0],))
            lat_in = jnp.concatenate([lat, lat]) if do_cfg else lat
            t_in = jnp.concatenate([t, t]) if do_cfg else t
            down_res, mid_res = controlnet.apply(
                {"params": params["controlnet"]},
                lat_in,
                t_in,
                context,
                pooled,
                time_ids,
                cond_in,
                controlnet_scale,
            )
            eps = unet.apply(
                {"params": params["unet"]},
                lat_in,
                t_in,
                context,
                pooled,
                time_ids,
                down_block_additional_residuals=down_res,
                mid_block_additional_residual=mid_res,
            )
            if do_cfg:
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                eps = eps_u + guidance_scale.astype(eps.dtype) * (eps_c - eps_u)
            lat = lcm_step(schedule, i, lat, eps, draw_noise(k_step))
            return lat, key

        lat, _ = jax.lax.fori_loop(0, schedule.num_steps, body, (lat, key))
        return lat

    return partial(denoise, mod.denoiser_params)


def make_sdxl_time_ids(batch: int, size: int, dtype=jnp.float32) -> jax.Array:
    """SDXL micro-conditioning ids: (orig_h, orig_w, crop_t, crop_l, tgt_h,
    tgt_w) — the img2img pipeline passes the model resolution for both."""
    ids = jnp.asarray([[size, size, 0, 0, size, size]], dtype=dtype)
    return jnp.tile(ids, (batch, 1))
