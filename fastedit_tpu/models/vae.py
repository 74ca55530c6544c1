"""AutoencoderKL — SDXL VAE (and fp16-fix variant; same architecture).

Replaces the external ``diffusers.AutoencoderKL`` bound at reference
src/pipeline.py:13,94-105 (SURVEY.md §2.2 E4): encode 1024²x3 -> 128²x4
latents (x scaling_factor), decode back.  The reference's VAE slicing/tiling
memory workarounds (src/pipeline.py:171-174) are deliberately absent — the
whole VAE runs HBM-resident on TPU.

bf16-safe by construction on TPU (wider exponent than fp16); norms in fp32.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from fastedit_tpu.models.configs import VAEConfig
from fastedit_tpu.models.layers import Attention, GroupNorm
from fastedit_tpu.models.resnet import Downsample2D, ResnetBlock2D, Upsample2D, _conv


class VAEAttention(nn.Module):
    """Single-head full attention over HW with residual (VAE mid block)."""

    groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(num_groups=self.groups, eps=1e-6, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        x = Attention(
            query_dim=c,
            heads=1,
            head_dim=c,
            qkv_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attention",
        )(x)
        return x.reshape(b, h, w, c) + residual


class VAEMidBlock(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        res = partial(
            ResnetBlock2D,
            x.shape[-1],
            use_time_emb=False,
            groups=self.config.norm_groups,
            eps=1e-6,
            **kw,
        )
        x = res(name="resnets_0")(x)
        x = VAEAttention(groups=self.config.norm_groups, name="attentions_0", **kw)(x)
        x = res(name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        conv = partial(_conv, **kw)
        x = conv(cfg.block_out_channels[0], 3, name="conv_in")(x.astype(self.dtype))
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(
                    ch,
                    use_time_emb=False,
                    groups=cfg.norm_groups,
                    eps=1e-6,
                    name=f"down_blocks_{i}_resnets_{j}",
                    **kw,
                )(x)
            if i < n - 1:
                x = Downsample2D(
                    ch,
                    asymmetric_pad=True,
                    name=f"down_blocks_{i}_downsamplers_0",
                    **kw,
                )(x)
        x = VAEMidBlock(cfg, name="mid_block", **kw)(x)
        x = GroupNorm(
            num_groups=cfg.norm_groups, eps=1e-6, act="silu", name="conv_norm_out"
        )(x)
        # Moments: mean + logvar.
        x = conv(2 * cfg.latent_channels, 3, name="conv_out")(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        conv = partial(_conv, **kw)
        rev = list(reversed(cfg.block_out_channels))
        x = conv(rev[0], 3, name="conv_in")(z.astype(self.dtype))
        x = VAEMidBlock(cfg, name="mid_block", **kw)(x)
        n = len(rev)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(
                    ch,
                    use_time_emb=False,
                    groups=cfg.norm_groups,
                    eps=1e-6,
                    name=f"up_blocks_{i}_resnets_{j}",
                    **kw,
                )(x)
            if i < n - 1:
                x = Upsample2D(ch, name=f"up_blocks_{i}_upsamplers_0", **kw)(x)
        x = GroupNorm(
            num_groups=cfg.norm_groups, eps=1e-6, act="silu", name="conv_norm_out"
        )(x)
        x = conv(cfg.in_channels, 3, name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    """KL VAE with diagonal-Gaussian posterior.

    ``encode_moments`` returns (mean, logvar) of the posterior; ``sample``
    draws from it; ``decode`` maps latents back to pixels.  Latent scaling
    (x0.13025) is applied by the *pipeline*, matching the reference stack.
    """

    config: VAEConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Encoder(self.config, **kw)
        self.decoder = Decoder(self.config, **kw)
        self.quant_conv = _conv(2 * self.config.latent_channels, 1, **kw)
        self.post_quant_conv = _conv(self.config.latent_channels, 1, **kw)

    def encode_moments(self, x: jax.Array):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, logvar

    @staticmethod
    def sample(mean: jax.Array, logvar: jax.Array, key: jax.Array) -> jax.Array:
        logvar = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(key, mean.shape, dtype=jnp.float32)
        return (mean.astype(jnp.float32) + std * eps).astype(mean.dtype)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, key: jax.Array) -> jax.Array:
        mean, logvar = self.encode_moments(x)
        z = self.sample(mean, logvar, key)
        return self.decode(z)
