"""DINO ViT-B/8 feature extractor + structural distance (Flax).

Equivalent of the reference's torch.hub DINO pipeline (src/metrics.py:24-147,
SURVEY.md §2.2 E10): MSE between the cosine self-similarity maps of the
layer-11 attention *keys* for source vs edited image.  Unlike the reference
— which fishes qkv out with forward hooks — the Flax model just returns the
per-layer keys explicitly (SURVEY.md E10: "no hooks needed").

timm-style ViT: patch conv embed, CLS token, learned pos-emb, pre-norm
blocks with fused qkv, GELU MLP, eps 1e-6.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from fastedit_tpu.models.layers import LayerNorm

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class DINOConfig:
    image_size: int = 224
    patch_size: int = 8
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    layer_norm_eps: float = 1e-6


DINO_VITB8 = DINOConfig()
TINY_DINO = DINOConfig(
    image_size=32, patch_size=8, hidden_size=32, num_layers=2, num_heads=2
)


class DINOBlock(nn.Module):
    config: DINOConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """Returns (block output, keys [B, heads, tokens, head_dim])."""
        cfg = self.config
        d = cfg.hidden_size
        hd = d // cfg.num_heads
        dense = partial(nn.Dense, dtype=self.dtype)
        ln = partial(LayerNorm, eps=cfg.layer_norm_eps)

        h = ln(name="norm1")(x)
        b, s, _ = h.shape
        qkv = dense(3 * d, name="qkv")(h).reshape(b, s, 3, cfg.num_heads, hd)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # [3, B, H, S, hd]
        q, k, v = qkv[0], qkv[1], qkv[2]
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = jnp.transpose(o, (0, 2, 1, 3)).reshape(b, s, d)
        x = x + dense(d, name="proj")(o)

        h = ln(name="norm2")(x)
        h = dense(d * cfg.mlp_ratio, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = dense(d, name="fc2")(h)
        return x + h, k


class DINOViT(nn.Module):
    """DINO ViT returning the attention keys of a chosen layer."""

    config: DINOConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array, layer: int = 11) -> jax.Array:
        """pixels: [B, H, W, 3] ImageNet-normalized.
        Returns keys [B, heads, tokens, head_dim] of ``layer``."""
        cfg = self.config
        b = pixels.shape[0]
        x = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(pixels.astype(self.dtype))
        n = x.shape[1] * x.shape[2]
        x = x.reshape(b, n, cfg.hidden_size)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size), jnp.float32
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(x.dtype), x], axis=1)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, n + 1, cfg.hidden_size),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)

        assert 0 <= layer < cfg.num_layers, f"layer {layer} out of range"
        # scan over the homogeneous block stack; per-layer keys collected as
        # scan outputs, then the requested layer selected.
        _, all_keys = nn.scan(
            _DINOScanBody,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_layers,
        )(cfg, dtype=self.dtype, name="blocks")(x)
        return all_keys[layer]


class _DINOScanBody(nn.Module):
    config: DINOConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x, keys = DINOBlock(self.config, dtype=self.dtype, name="block")(x)
        return x, keys


def keys_self_similarity(keys: jax.Array) -> jax.Array:
    """Cosine self-similarity of head-concatenated keys.

    keys: [B, heads, tokens, head_dim] -> [B, tokens, tokens]
    (reference src/metrics.py:71-83: concatenate heads per token, cosine).
    """
    b, h, t, d = keys.shape
    x = jnp.transpose(keys, (0, 2, 1, 3)).reshape(b, t, h * d).astype(jnp.float32)
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    denom = jnp.maximum(norm @ jnp.swapaxes(norm, 1, 2), 1e-8)
    return (x @ jnp.swapaxes(x, 1, 2)) / denom


def dino_distance(keys_src: jax.Array, keys_edit: jax.Array) -> jax.Array:
    """Per-image MSE between self-similarity maps [B]
    (reference src/metrics.py:138-147)."""
    return jnp.mean(
        jnp.square(keys_self_similarity(keys_edit) - keys_self_similarity(keys_src)),
        axis=(1, 2),
    )
