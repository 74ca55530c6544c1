"""Core NHWC building blocks shared by UNet / ControlNet / VAE.

Behavior spec comes from the diffusers module zoo the reference binds at
src/pipeline.py:8-14; the implementation is TPU-first: NHWC layout, bf16
compute with fp32 normalization statistics and fp32 softmax, and all
attention routed through ``fastedit_tpu.ops.attention`` (Pallas flash kernel
on TPU, XLA reference elsewhere).

Param naming deliberately mirrors the HF checkpoint tensor names
(``to_q``, ``net_0_proj``, ``time_emb_proj`` ...) so the offline checkpoint
converter (tools/convert_checkpoint.py) is a mechanical rename + transpose.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fastedit_tpu import ops


def timestep_embedding(
    t: jax.Array,
    dim: int,
    *,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
) -> jax.Array:
    """Sinusoidal timestep embeddings, fp32. t: [B] -> [B, dim].

    SDXL convention: flip_sin_to_cos=True, downscale_freq_shift=0
    (used for the 320-d timestep and the 256-d added-time-id embeddings).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    if flip_sin_to_cos:
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    else:
        emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP lifting a sinusoidal embedding to the time channel."""

    out_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=self.param_dtype)
        x = dense(self.out_dim, name="linear_1")(x.astype(self.dtype))
        x = jax.nn.silu(x)
        x = dense(self.out_dim, name="linear_2")(x)
        return x


class GroupNorm(nn.Module):
    """Param-holding wrapper over the dispatching ops.group_norm kernel."""

    num_groups: int = 32
    eps: float = 1e-5
    act: Optional[str] = None  # fused activation: None | "silu"
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, scale_shift: bool = False):
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        beta = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        if scale_shift:
            # Fused-resnet prologue path: return per-(batch, channel) f32
            # (scale, shift) folding the GN statistics with gamma/beta; the
            # normalize(+act) map itself runs inside the consuming conv
            # kernel's VMEM tile (ops/conv_fused.conv3x3_fused), which
            # applies SiLU unconditionally — refuse to silently drop a
            # different activation.
            assert self.act == "silu", (
                "scale_shift prologue consumers hardcode SiLU; "
                f"this GroupNorm has act={self.act!r}"
            )
            from fastedit_tpu.ops.groupnorm import group_norm_scale_shift

            return group_norm_scale_shift(
                x, gamma, beta, num_groups=self.num_groups, eps=self.eps
            )
        return ops.group_norm(
            x, gamma, beta, num_groups=self.num_groups, eps=self.eps, act=self.act
        )


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics, output cast back to input dtype."""

    eps: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        beta = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        out = out * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        return out.astype(x.dtype)


class Attention(nn.Module):
    """Multi-head attention (self or cross) over [B, S, C] sequences."""

    query_dim: int
    heads: int
    head_dim: int
    qkv_bias: bool = False
    out_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Optional[jax.Array] = None
    ) -> jax.Array:
        ctx = x if context is None else context
        inner = self.heads * self.head_dim
        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=self.param_dtype)
        q = dense(inner, use_bias=self.qkv_bias, name="to_q")(x)
        k = dense(inner, use_bias=self.qkv_bias, name="to_k")(ctx)
        v = dense(inner, use_bias=self.qkv_bias, name="to_v")(ctx)
        b, sq, _ = q.shape
        skv = ctx.shape[1]
        q = q.reshape(b, sq, self.heads, self.head_dim)
        k = k.reshape(b, skv, self.heads, self.head_dim)
        v = v.reshape(b, skv, self.heads, self.head_dim)
        out = ops.attention(q, k, v).reshape(b, sq, inner)
        return dense(self.query_dim, use_bias=self.out_bias, name="to_out")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward: Dense(d -> 2*mult*d), x * gelu(gate), Dense back."""

    dim: int
    mult: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.dim * self.mult
        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=self.param_dtype)
        hidden = dense(inner * 2, name="net_0_proj")(x)
        value, gate = jnp.split(hidden, 2, axis=-1)
        hidden = value * jax.nn.gelu(gate, approximate=False)
        return dense(self.dim, name="net_2")(hidden)


class BasicTransformerBlock(nn.Module):
    """Self-attn -> cross-attn -> GEGLU FF, each pre-LayerNormed + residual."""

    dim: int
    heads: int
    head_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        attn = partial(
            Attention,
            query_dim=self.dim,
            heads=self.heads,
            head_dim=self.head_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        x = x + attn(name="attn1")(LayerNorm(name="norm1")(x))
        x = x + attn(name="attn2")(LayerNorm(name="norm2")(x), context=context)
        x = x + FeedForward(
            self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="ff"
        )(LayerNorm(name="norm3")(x))
        return x


class Transformer2DModel(nn.Module):
    """Spatial transformer over NHWC features (linear projection variant).

    GroupNorm -> flatten HW -> proj_in -> N BasicTransformerBlocks (with
    cross-attention context) -> proj_out -> unflatten -> + residual.
    """

    depth: int
    heads: int
    head_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        inner = self.heads * self.head_dim
        residual = x
        x = GroupNorm(num_groups=32, eps=1e-6, name="norm")(x)
        x = x.reshape(b, h * w, c)
        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=self.param_dtype)
        x = dense(inner, name="proj_in")(x)
        # lax.scan over the homogeneous block stack (params stacked on axis
        # 0): SDXL's depth-10 stacks compile as one block body (also used at
        # depth 1 so the param tree shape is uniform).
        x, _ = nn.scan(
            _TransformerScanBody,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.depth,
            in_axes=nn.broadcast,
        )(
            dim=inner,
            heads=self.heads,
            head_dim=self.head_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="transformer_blocks",
        )(x, context)
        x = dense(c, name="proj_out")(x)
        return x.reshape(b, h, w, c) + residual


class _TransformerScanBody(nn.Module):
    dim: int
    heads: int
    head_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        x = BasicTransformerBlock(
            dim=self.dim,
            heads=self.heads,
            head_dim=self.head_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="block",
        )(x, context)
        return x, None
