"""Jitted pipeline stages: prompt encode / prepare / denoise loop / decode.

TPU-native replacement for the diffusers SDXL-ControlNet-Img2Img call the
reference makes at src/pipeline.py:261-272 (SURVEY.md §2.2 E1).  The whole
pixel path (Canny prepare -> VAE encode -> 4-step ControlNet+UNet+CFG+LCM
``lax.fori_loop`` -> VAE decode -> uint8) compiles into ONE XLA program
(``make_edit_core``) — a single host dispatch per edit; prompt encoding is
a separate program so embeddings cache per prompt string.  Individual
stage programs are also exposed for tests/tools.

Params are explicit arguments (never closure-captured) so the multi-GB
weight trees stay XLA *parameters*, not embedded constants.

Semantics mirrored from the external pipeline (behavior spec, not a port):
  * dual-tower prompt encoding; context = concat(penultimate states),
    pooled = tower-2 projected pooled embedding.
  * classifier-free guidance with a 2x batch (uncond first) when
    guidance_scale > 1, skipped entirely at <= 1 (trace-time decision,
    matching diffusers' ``do_classifier_free_guidance``).
  * VAE encode -> x scaling_factor; strength-truncated initial noising;
    per-step fresh noise injection (LCM); decode -> uint8 images.
  * ``tile_noise``: every batch element gets the same noise stream — the
    reference's fixed-seed batch loop creates a fresh same-seeded generator
    per image (run_batch.py:208-219).
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
from fastedit_tpu.ops import flags
from fastedit_tpu.parallel.mesh import DATA_AXIS
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

    @property
    def pixel_params(self):
        return {
            "unet": self.unet_params,
            "controlnet": self.controlnet_params,
            "vae": self.vae_params,
        }


# --------------------------------------------------------------------- text


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


# ----------------------------------------------------------- raw stage fns


def _prepare_one_fn(mod: PipelineModules, control_res: int):
    """uint8 [H, W, 3] -> (canny control [r, r, 3], VAE input [H, W, 3])."""
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

    return prepare_one


def _vae_sample_fn(mod: PipelineModules):
    vae, scale = mod.vae, mod.vae_scaling_factor

    def vae_sample(vae_params, image, key, tile_noise: bool):
        """[-1, 1] image -> scaled posterior-sampled latents."""
        # Trace-time dispatch: the encoder context keeps XLA by default
        # (flags.use_pallas_conv_encode — the r2/3 A/B loss predates full
        # strided-conv coverage; re-A/B with bench_conv.py encode).
        fused_resnet, fused_down2 = flags.resolve_fused_encode()
        with flags.override(
            use_pallas_conv=flags.use_pallas_conv_encode(),
            use_fused_resnet=fused_resnet,
            use_fused_down2=fused_down2,
        ):
            mean, logvar = vae.apply(
                {"params": vae_params}, image, method=vae.encode_moments
            )
        if tile_noise:
            eps = jax.random.normal(key, (1, *mean.shape[1:]), dtype=jnp.float32)
            logv = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
            z = (mean.astype(jnp.float32) + jnp.exp(0.5 * logv) * eps).astype(
                mean.dtype
            )
        else:
            z = AutoencoderKL.sample(mean, logvar, key)
        return z * scale

    return vae_sample


def _vae_decode_fn(mod: PipelineModules, mesh=None):
    vae, scale = mod.vae, mod.vae_scaling_factor

    def decode_one(vae_params, latents):
        # Trace-time dispatch: the fused Pallas decoder (resnet fusion +
        # phase-decomposed upsample convs) wins in the decoder context
        # (82.0 vs 98.4 ms — flags.use_pallas_conv_decode) while the
        # encoder keeps the XLA default.
        fused_resnet, fused_up2 = flags.resolve_fused_decode()
        with flags.override(
            use_pallas_conv=flags.use_pallas_conv_decode(),
            use_fused_resnet=fused_resnet,
            use_fused_up2=fused_up2,
        ):
            img = vae.apply(
                {"params": vae_params}, latents / scale, method=vae.decode
            )
        img01 = jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
        return (img01 * 255.0 + 0.5).astype(jnp.uint8)

    def _map_decode(vae_params, latents):
        return jax.lax.map(
            lambda z: decode_one(vae_params, z[None])[0], latents
        )

    def vae_decode(vae_params, latents):
        """scaled latents -> uint8 image (PIL round-half-up, on device).

        Batched decode is memory-bound, not MXU-bound: at 1024² the decoder's
        activations are ~1 GB/image, so batch >2 OOMs a 16 GB chip and batch
        2 already degrades scheduling.  lax.map decodes per image — peak
        memory stays single-image while the program remains one dispatch.

        Under DP the lax.map must run over the *local* rows only: a scan
        over a batch-sharded axis makes XLA all-gather the latents and
        decode every image on every device (O(global batch) serial decode
        per chip, and a replicated output that costs a second all-gather of
        the decoded pixels over ICI).  shard_map over the data axis keeps
        the scan local — per-device peak memory stays single-image, decode
        time scales 1/n_devices, and the output stays batch-sharded for
        per-host readback.
        """
        if latents.shape[0] == 1:
            return decode_one(vae_params, latents)
        ndata = mesh.shape[DATA_AXIS] if mesh is not None else 1
        if ndata > 1 and latents.shape[0] % ndata == 0:
            from jax.sharding import PartitionSpec as P

            return jax.shard_map(
                _map_decode,
                mesh=mesh,
                in_specs=(P(), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
                check_vma=False,
            )(vae_params, latents)
        return _map_decode(vae_params, latents)

    return vae_decode


def _denoise_fn(mod: PipelineModules):
    from fastedit_tpu.models.controlnet import ConditioningEmbedding

    unet, controlnet = mod.unet, mod.controlnet
    cn_cfg = controlnet.config
    cond_embedder = ConditioningEmbedding(
        channels=cn_cfg.conditioning_embedding_channels,
        out_channels=cn_cfg.unet.block_out_channels[0],
        dtype=controlnet.dtype,
        param_dtype=controlnet.param_dtype,
    )

    def denoise(
        params,
        latents: jax.Array,  # [B, h, w, 4] *clean* scaled latents
        context: jax.Array,  # [B, 77, D]; CFG: [2B] PAIR-INTERLEAVED (u0,c0,u1,c1,...)
        pooled: jax.Array,  # [B or 2B, P]
        time_ids: jax.Array,  # [B or 2B, 6]
        control_image: jax.Array,  # [B, H, W, 3] in [0, 1]
        schedule: LCMSchedule,
        guidance_scale: jax.Array,
        controlnet_scale: jax.Array,
        key: jax.Array,
        do_cfg: bool,
        tile_noise: bool,
    ) -> jax.Array:
        b = latents.shape[0]
        if do_cfg:
            assert context.shape[0] == 2 * b, (
                "CFG expects pair-interleaved [2B] context"
            )
        # Trace-time dispatch: the Pallas conv wins inside the denoise
        # loop (flags.use_pallas_conv_denoise) while the VAE stages keep
        # the XLA conv path — the flag context applies to everything
        # traced in this function body.  Fusion choice is per-context:
        # up2 ON / whole-resnet OFF in the loop (flags.resolve_fused_denoise
        # records the measured matrix).
        fused_resnet, fused_up2 = flags.resolve_fused_denoise()
        with flags.override(
            use_pallas_conv=flags.use_pallas_conv_denoise(),
            use_fused_resnet=fused_resnet,
            use_fused_up2=fused_up2,
            # UNet downsamplers: conv3x3_down2 ON by default in-loop
            # (r4 A/B win); explicit FLAGS.use_fused_down2 overrides.
            use_fused_down2=flags.resolve_fused_down2_denoise(),
        ):
            return _denoise_body(
                params, latents, context, pooled, time_ids, control_image,
                schedule, guidance_scale, controlnet_scale, key,
                do_cfg, tile_noise, b,
            )

    def _denoise_body(
        params, latents, context, pooled, time_ids, control_image,
        schedule, guidance_scale, controlnet_scale, key,
        do_cfg, tile_noise, b,
    ):
        # CFG batch layout is PAIR-INTERLEAVED, not [all-uncond; all-cond]:
        # with the batch dim sharded over the data mesh axis, each image's
        # (uncond, cond) rows stay on one device, so the guidance combine is
        # communication-free (a concat/split layout would shuffle the full
        # activations over ICI every step).
        # The Canny cond tower (pixel image -> latent-resolution features)
        # is timestep- AND CFG-half-invariant: run it ONCE at batch B here
        # instead of at batch 2B inside every loop step (a 6x reduction of
        # that tower's cost under CFG with 3 executed steps).
        cond_feat = cond_embedder.apply(
            {"params": params["controlnet"]["controlnet_cond_embedding"]},
            control_image.astype(controlnet.dtype),
        )
        cond_in = jnp.repeat(cond_feat, 2, axis=0) if do_cfg else cond_feat

        def draw_noise(k):
            if tile_noise:
                n = jax.random.normal(k, (1, *latents.shape[1:]), dtype=jnp.float32)
                return jnp.broadcast_to(n, latents.shape)
            return jax.random.normal(k, latents.shape, dtype=jnp.float32)

        key, k_init = jax.random.split(key)
        lat = add_noise(schedule, latents.astype(jnp.float32), draw_noise(k_init))
        lat = lat.astype(latents.dtype)

        def body(i, carry):
            lat, key = carry
            key, k_step = jax.random.split(key)
            lat_in = jnp.repeat(lat, 2, axis=0) if do_cfg else lat
            t_in = jnp.broadcast_to(schedule.timesteps[i], (lat_in.shape[0],))
            down_res, mid_res = controlnet.apply(
                {"params": params["controlnet"]},
                lat_in,
                t_in,
                context,
                pooled,
                time_ids,
                cond_in,
                controlnet_scale,
                cond_pre_embedded=True,
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
                e = eps.reshape(lat.shape[0], 2, *eps.shape[1:])
                eps_u, eps_c = e[:, 0], e[:, 1]
                eps = eps_u + guidance_scale.astype(eps.dtype) * (eps_c - eps_u)
            lat = lcm_step(schedule, i, lat, eps, draw_noise(k_step))
            return lat, key

        lat, _ = jax.lax.fori_loop(0, schedule.num_steps, body, (lat, key))
        return lat

    return denoise


# ------------------------------------------------------------ jitted stages


def make_prepare_inputs(mod: PipelineModules, control_res: int):
    prepare_one = _prepare_one_fn(mod, control_res)

    @jax.jit
    def prepare(img_u8, low, high):
        control, vae_in = prepare_one(img_u8, low, high)
        return control[None], vae_in[None]

    prepare_batch = jax.jit(jax.vmap(prepare_one, in_axes=(0, None, None)))
    return prepare, prepare_batch


def make_vae_encode(mod: PipelineModules):
    vae_sample = _vae_sample_fn(mod)

    @partial(jax.jit, static_argnames=("tile_noise",))
    def vae_encode(params, image, key, tile_noise: bool = False):
        return vae_sample(params, image, key, tile_noise)

    return partial(vae_encode, mod.vae_params)


def make_vae_decode(mod: PipelineModules, mesh=None):
    vae_decode = _vae_decode_fn(mod, mesh=mesh)

    @jax.jit
    def decode(params, latents):
        return vae_decode(params, latents)

    return partial(decode, mod.vae_params)


def make_denoise(mod: PipelineModules):
    denoise = _denoise_fn(mod)

    @partial(
        jax.jit, static_argnames=("do_cfg", "tile_noise"), donate_argnums=(1,)
    )
    def denoise_jit(params, *args, do_cfg, tile_noise=False):
        return denoise(params, *args, do_cfg=do_cfg, tile_noise=tile_noise)

    return partial(denoise_jit, mod.denoiser_params)


def make_edit_core(mod: PipelineModules, control_res: int, mesh=None):
    """The whole pixel path as ONE device program (single dispatch/edit)."""
    prepare_one = _prepare_one_fn(mod, control_res)
    vae_sample = _vae_sample_fn(mod)
    vae_decode = _vae_decode_fn(mod, mesh=mesh)
    denoise = _denoise_fn(mod)

    @partial(jax.jit, static_argnames=("do_cfg", "tile_noise"))
    def edit_core(
        params,
        img_u8: jax.Array,  # [B, H, W, 3] uint8
        canny_low: jax.Array,
        canny_high: jax.Array,
        context: jax.Array,
        pooled: jax.Array,
        time_ids: jax.Array,
        schedule: LCMSchedule,
        guidance_scale: jax.Array,
        controlnet_scale: jax.Array,
        key: jax.Array,
        do_cfg: bool,
        tile_noise: bool = False,
    ) -> jax.Array:
        control, vae_in = jax.vmap(prepare_one, in_axes=(0, None, None))(
            img_u8, canny_low, canny_high
        )
        key, k_enc = jax.random.split(key)
        latents = vae_sample(params["vae"], vae_in, k_enc, tile_noise)
        latents = denoise(
            params,
            latents,
            context,
            pooled,
            time_ids,
            control,
            schedule,
            guidance_scale,
            controlnet_scale,
            key,
            do_cfg=do_cfg,
            tile_noise=tile_noise,
        )
        return vae_decode(params["vae"], latents)

    return partial(edit_core, mod.pixel_params)


def make_sdxl_time_ids(batch: int, size: int, dtype=jnp.float32) -> jax.Array:
    """SDXL micro-conditioning ids: (orig_h, orig_w, crop_t, crop_l, tgt_h,
    tgt_w) — the img2img pipeline passes the model resolution for both."""
    ids = jnp.asarray([[size, size, 0, 0, size, size]], dtype=dtype)
    return jnp.tile(ids, (batch, 1))
