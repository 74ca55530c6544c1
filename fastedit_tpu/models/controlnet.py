"""ControlNet (Canny) for the SDXL family — UNet-encoder clone + zero convs.

Replaces the external ``diffusers.ControlNetModel`` the reference loads at
src/pipeline.py:10,82-92 (SURVEY.md §2.2 E3): the small canny variant by
default, the full one behind a flag.  Produces one residual per UNet skip
connection plus a mid residual, each scaled by ``conditioning_scale``
(reference runs 0.5).  The conditioning image (Canny edges in [0, 1],
pixel resolution) is folded in through a strided conv tower whose output is
added to the latent stem.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fastedit_tpu.models.configs import ControlNetConfig
from fastedit_tpu.models.unet import DownBlock, MidBlock, SDXLConditioningEmbedder
from fastedit_tpu.models.resnet import StridedConv3x3, _conv


class ConditioningEmbedding(nn.Module):
    """Pixel-space cond image -> latent-resolution feature via strided convs."""

    channels: Tuple[int, ...]
    out_channels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cond: jax.Array) -> jax.Array:
        conv = partial(_conv, dtype=self.dtype, param_dtype=self.param_dtype)
        x = jax.nn.silu(conv(self.channels[0], 3, name="conv_in")(cond))
        for i in range(len(self.channels) - 1):
            x = jax.nn.silu(conv(self.channels[i], 3, name=f"blocks_{2*i}")(x))
            # StridedConv3x3, NOT nn.Conv(padding="SAME"): torch's
            # Conv2d(stride=2, padding=1) pads (1,1) while Flax SAME pads
            # (0,1) at even sizes — a one-pixel-shifted sampling grid that
            # silently mismatches trained checkpoint weights.
            x = jax.nn.silu(
                StridedConv3x3(
                    self.channels[i + 1],
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"blocks_{2*i+1}",
                )(x)
            )
        # Zero-initialized output conv: ControlNet starts as a no-op.
        x = _conv(
            self.out_channels,
            3,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.zeros,
            name="conv_out",
        )(x)
        return x


class ControlNetModel(nn.Module):
    """Returns (down_block_residuals, mid_residual) for UNet injection.

    The conditioning image must already be downsampled to
    ``latent_hw * 2**(len(cond_channels)-1)`` pixels; for the SDXL configs
    that is the native 1024² pixel image for 128² latents.
    """

    config: ControlNetConfig
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
        controlnet_cond: jax.Array,
        conditioning_scale: jax.Array | float = 1.0,
        cond_pre_embedded: bool = False,
    ):
        cfg = self.config.unet
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
        if cond_pre_embedded:
            # Caller ran the cond tower already (it is timestep- and
            # CFG-half-invariant, so the denoise loop hoists it — see
            # pipeline/stages.py); ``controlnet_cond`` here is the
            # latent-resolution feature map, not the pixel image.
            x = x + controlnet_cond.astype(self.dtype)
        else:
            x = x + ConditioningEmbedding(
                channels=self.config.conditioning_embedding_channels,
                out_channels=cfg.block_out_channels[0],
                name="controlnet_cond_embedding",
                **kw,
            )(controlnet_cond.astype(self.dtype))

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

        if cfg.mid_transformer_layers is not None:
            x = MidBlock(
                transformer_depth=cfg.mid_transformer_layers,
                heads=cfg.num_attention_heads[-1],
                head_dim=head_dims[-1],
                config=cfg,
                name="mid_block",
                **kw,
            )(x, temb, context)

        # Zero-initialized 1x1 projections, one per skip + mid.
        zero_conv = partial(
            _conv, kernel=1, kernel_init=nn.initializers.zeros, **kw
        )
        scale = jnp.asarray(conditioning_scale, dtype=jnp.float32)
        down_res = tuple(
            (
                zero_conv(s.shape[-1], name=f"controlnet_down_blocks_{i}")(s)
                * scale
            ).astype(self.dtype)
            for i, s in enumerate(skips)
        )
        mid_res = (
            zero_conv(x.shape[-1], name="controlnet_mid_block")(x) * scale
        ).astype(self.dtype)
        return down_res, mid_res
