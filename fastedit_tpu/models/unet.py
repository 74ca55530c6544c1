"""UNet2DConditionModel — SDXL / SSD-1B conditional UNet, config-driven.

Replaces the external ``diffusers.UNet2DConditionModel`` the reference loads
at src/pipeline.py:12,115-124 (SURVEY.md §2.2 E2).  One class covers both the
SDXL and the SSD-1B pruned-depth topologies via ``UNetConfig``'s per-layer
transformer-depth tuples.

TPU-first: NHWC layout, bf16 compute / fp32 norm statistics, attention via
ops.attention (Pallas flash kernel on TPU).  Forward is a pure function of
(params, inputs) and jits into a single XLA program; the 4-step LCM loop
wraps it with ``lax.fori_loop`` in pipeline/stages.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fastedit_tpu.models.configs import UNetConfig
from fastedit_tpu.models.layers import (
    GroupNorm,
    TimestepEmbedding,
    Transformer2DModel,
    timestep_embedding,
)
from fastedit_tpu.models.resnet import Downsample2D, ResnetBlock2D, Upsample2D, _conv


class SDXLConditioningEmbedder(nn.Module):
    """Time + added-condition embeddings shared by UNet and ControlNet.

    emb = MLP(sin(t)) + MLP(concat(pooled_text_emb, sin(time_ids))).
    """

    config: UNetConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, timestep: jax.Array, text_embeds: jax.Array, time_ids: jax.Array
    ) -> jax.Array:
        cfg = self.config
        emb_kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        t_emb = timestep_embedding(timestep, cfg.block_out_channels[0])
        emb = TimestepEmbedding(cfg.time_embed_dim, name="time_embedding", **emb_kw)(
            t_emb
        )
        b, n_ids = time_ids.shape
        ids_emb = timestep_embedding(
            time_ids.reshape(-1), cfg.addition_time_embed_dim
        ).reshape(b, n_ids * cfg.addition_time_embed_dim)
        add_in = jnp.concatenate(
            [text_embeds.astype(jnp.float32), ids_emb], axis=-1
        )
        assert add_in.shape[-1] == cfg.projection_class_embeddings_input_dim, (
            f"added-cond input dim {add_in.shape[-1]} != configured "
            f"{cfg.projection_class_embeddings_input_dim}"
        )
        aug = TimestepEmbedding(cfg.time_embed_dim, name="add_embedding", **emb_kw)(
            add_in
        )
        return (emb + aug).astype(self.dtype)


class DownBlock(nn.Module):
    """Resnets (+ per-layer transformers) + optional downsample.

    Returns the new hidden state and the skip residuals this block appends
    (one per resnet layer, plus the downsampled output).
    """

    out_channels: int
    transformer_depths: Tuple[int, ...]
    heads: int
    head_dim: int
    add_downsample: bool
    config: UNetConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        residuals = []
        for j, depth in enumerate(self.transformer_depths):
            x = ResnetBlock2D(
                self.out_channels,
                groups=cfg.norm_groups,
                eps=cfg.norm_eps,
                name=f"resnets_{j}",
                **kw,
            )(x, temb)
            if depth > 0:
                x = Transformer2DModel(
                    depth=depth,
                    heads=self.heads,
                    head_dim=self.head_dim,
                    name=f"attentions_{j}",
                    **kw,
                )(x, context)
            residuals.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0", **kw)(x)
            residuals.append(x)
        return x, residuals


class MidBlock(nn.Module):
    """resnet -> [transformer -> resnet] with configurable transformer depth."""

    transformer_depth: int
    heads: int
    head_dim: int
    config: UNetConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ch = x.shape[-1]
        x = ResnetBlock2D(
            ch, groups=cfg.norm_groups, eps=cfg.norm_eps, name="resnets_0", **kw
        )(x, temb)
        if self.transformer_depth > 0:
            x = Transformer2DModel(
                depth=self.transformer_depth,
                heads=self.heads,
                head_dim=self.head_dim,
                name="attentions_0",
                **kw,
            )(x, context)
        x = ResnetBlock2D(
            ch, groups=cfg.norm_groups, eps=cfg.norm_eps, name="resnets_1", **kw
        )(x, temb)
        return x


class UpBlock(nn.Module):
    """Skip-concat resnets (+ per-layer transformers) + optional upsample."""

    out_channels: int
    transformer_depths: Tuple[int, ...]
    heads: int
    head_dim: int
    add_upsample: bool
    config: UNetConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skips: Sequence[jax.Array], temb, context):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        assert len(skips) == len(self.transformer_depths)
        for j, depth in enumerate(self.transformer_depths):
            x = jnp.concatenate([x, skips[j]], axis=-1)
            x = ResnetBlock2D(
                self.out_channels,
                groups=cfg.norm_groups,
                eps=cfg.norm_eps,
                name=f"resnets_{j}",
                **kw,
            )(x, temb)
            if depth > 0:
                x = Transformer2DModel(
                    depth=depth,
                    heads=self.heads,
                    head_dim=self.head_dim,
                    name=f"attentions_{j}",
                    **kw,
                )(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, name="upsamplers_0", **kw)(x)
        return x


class UNet2DConditionModel(nn.Module):
    """The SDXL-family denoiser.  Inputs NHWC latents, outputs epsilon.

    Args to __call__:
        latents: [B, h, w, in_channels] noisy latents.
        timestep: [B] int/float diffusion timesteps.
        encoder_hidden_states: [B, S_text, cross_attention_dim] text context.
        text_embeds: [B, pooled_dim] pooled text embedding (added cond).
        time_ids: [B, 6] SDXL micro-conditioning ids.
        down_block_additional_residuals: optional ControlNet residuals, one
            per skip connection (added to the stored skips).
        mid_block_additional_residual: optional ControlNet mid residual.
    """

    config: UNetConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        text_embeds: jax.Array,
        time_ids: jax.Array,
        down_block_additional_residuals: Optional[Sequence[jax.Array]] = None,
        mid_block_additional_residual: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        conv = partial(_conv, **kw)
        if timestep.ndim == 0:
            timestep = jnp.broadcast_to(timestep, (latents.shape[0],))

        temb = SDXLConditioningEmbedder(cfg, name="cond_embedder", **kw)(
            timestep, text_embeds, time_ids
        )
        context = encoder_hidden_states.astype(self.dtype)
        x = conv(cfg.block_out_channels[0], 3, name="conv_in")(
            latents.astype(self.dtype)
        )

        # ---- down path, collecting skip residuals -------------------------
        skips = [x]
        n_blocks = len(cfg.block_out_channels)
        head_dims = [
            ch // h for ch, h in zip(cfg.block_out_channels, cfg.num_attention_heads)
        ]
        for i, out_ch in enumerate(cfg.block_out_channels):
            x, res = DownBlock(
                out_channels=out_ch,
                transformer_depths=cfg.down_transformer_layers[i],
                heads=cfg.num_attention_heads[i],
                head_dim=head_dims[i],
                add_downsample=i < n_blocks - 1,
                config=cfg,
                name=f"down_blocks_{i}",
                **kw,
            )(x, temb, context)
            skips.extend(res)

        # ---- ControlNet residual injection (E3) ---------------------------
        if down_block_additional_residuals is not None:
            assert len(down_block_additional_residuals) == len(skips), (
                f"got {len(down_block_additional_residuals)} controlnet "
                f"residuals for {len(skips)} skips"
            )
            skips = [
                s + r.astype(s.dtype)
                for s, r in zip(skips, down_block_additional_residuals)
            ]

        # ---- mid ----------------------------------------------------------
        if cfg.mid_transformer_layers is not None:
            x = MidBlock(
                transformer_depth=cfg.mid_transformer_layers,
                heads=cfg.num_attention_heads[-1],
                head_dim=head_dims[-1],
                config=cfg,
                name="mid_block",
                **kw,
            )(x, temb, context)
        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual.astype(x.dtype)

        # ---- up path, consuming skips newest-first ------------------------
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, out_ch in enumerate(rev_channels):
            n_layers = cfg.layers_per_block + 1
            block_skips = skips[-n_layers:][::-1]
            del skips[-n_layers:]
            x = UpBlock(
                out_channels=out_ch,
                transformer_depths=cfg.up_transformer_layers[i],
                heads=cfg.num_attention_heads[n_blocks - 1 - i],
                head_dim=head_dims[n_blocks - 1 - i],
                add_upsample=i < n_blocks - 1,
                config=cfg,
                name=f"up_blocks_{i}",
                **kw,
            )(x, block_skips, temb, context)
        assert not skips

        x = GroupNorm(
            num_groups=cfg.norm_groups, eps=cfg.norm_eps, act="silu",
            name="conv_norm_out",
        )(x)
        x = conv(cfg.out_channels, 3, name="conv_out")(x)
        return x
