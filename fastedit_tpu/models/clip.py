"""CLIP text towers (and the generic ViT encoder reused by metrics models).

Replaces the ``transformers`` CLIP encoders the reference loads transitively
through the diffusers pipeline (SURVEY.md §2.2 E6): SDXL conditions on the
concatenated penultimate hidden states of CLIP ViT-L/14 (768-d) and OpenCLIP
ViT-bigG/14 (1280-d) -> 2048-d per-token context, plus bigG's projected
pooled embedding for the added-cond path.

77-token sequences are tiny; attention here is a plain fp32-softmax einsum
with a causal mask (no Pallas needed — the flash kernel targets the UNet's
4096-token image attention).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fastedit_tpu.models.configs import CLIPTextConfig, CLIPVisionConfig
from fastedit_tpu.models.layers import LayerNorm


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return partial(jax.nn.gelu, approximate=False)
    raise ValueError(f"unsupported activation {name!r}")


class CLIPAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
        d = self.hidden_size // self.num_heads
        dense = partial(
            nn.Dense, self.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype
        )
        b, s, _ = x.shape
        shape = (b, s, self.num_heads, d)
        q = dense(name="q_proj")(x).reshape(shape)
        k = dense(name="k_proj")(x).reshape(shape)
        v = dense(name="v_proj")(x).reshape(shape)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * (d**-0.5)
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, self.hidden_size)
        return dense(name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    # duck-typed: any config with hidden_size/num_heads/intermediate_size/
    # hidden_act/layer_norm_eps (text or vision).
    config: Any
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = partial(LayerNorm, eps=cfg.layer_norm_eps, param_dtype=self.param_dtype)
        x = x + CLIPAttention(
            cfg.hidden_size, cfg.num_heads, name="self_attn", **kw
        )(ln(name="layer_norm1")(x), mask)
        h = ln(name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, name="mlp_fc1", **kw)(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, name="mlp_fc2", **kw)(h)
        return x + h


def _scan_encoder_layers(parent, cfg, x, mask, name, collect=False):
    """Run ``cfg.num_layers`` CLIPEncoderLayers via nn.scan.

    Params live under ``<name>`` with a stacked leading layer axis.  With
    ``collect`` the per-layer outputs are returned stacked [L, B, S, D]
    (needed for the penultimate hidden state); else only the final state.
    """
    scanned = nn.scan(
        CLIPEncoderLayerScanBody,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=cfg.num_layers,
        in_axes=nn.broadcast,
    )(
        cfg,
        dtype=parent.dtype,
        param_dtype=parent.param_dtype,
        name=name,
    )
    final, ys = scanned(x, mask)
    return ys if collect else final


class CLIPEncoderLayerScanBody(nn.Module):
    """scan body wrapper: carry = hidden state, y = hidden state."""

    config: Any
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        x = CLIPEncoderLayer(
            self.config,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="layer",
        )(x, mask)
        return x, x


@dataclasses.dataclass
class CLIPTextOutput:
    last_hidden_state: jax.Array  # [B, S, D] after final LayerNorm
    penultimate_hidden_state: jax.Array  # [B, S, D] input of the last layer
    pooled_output: jax.Array  # [B, D or projection_dim]


class CLIPTextModel(nn.Module):
    """CLIP text tower; returns final, penultimate, and pooled outputs.

    ``penultimate_hidden_state`` is HF's ``hidden_states[-2]`` (the hidden
    state *entering* the last encoder layer) — what SDXL consumes from both
    towers.  ``pooled_output`` is the final-LayerNormed hidden state at the
    first EOS token, passed through ``text_projection`` when configured
    (OpenCLIP bigG).
    """

    config: CLIPTextConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> CLIPTextOutput:
        cfg = self.config
        b, s = input_ids.shape
        assert s <= cfg.max_positions
        tok = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="token_embedding",
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.max_positions, cfg.hidden_size),
            self.param_dtype,
        )
        x = tok + pos[None, :s].astype(tok.dtype)

        causal = jnp.triu(jnp.full((s, s), -jnp.inf, dtype=jnp.float32), k=1)
        mask = causal[None, None]

        # lax.scan over the homogeneous layer stack (params stacked on axis
        # 0): the 32-layer bigG tower compiles as ONE layer body instead of
        # 32 inlined copies — compile time and HLO size drop ~L-fold.
        hidden = _scan_encoder_layers(
            self, cfg, x, mask, name="layers", collect=True
        )
        penultimate = hidden[cfg.num_layers - 2] if cfg.num_layers > 1 else x
        x = hidden[cfg.num_layers - 1]
        x = LayerNorm(
            eps=cfg.layer_norm_eps,
            param_dtype=self.param_dtype,
            name="final_layer_norm",
        )(x)

        if cfg.eos_token_id == 2:
            # transformers legacy path: CLIP/SDXL config.json files ship the
            # historically-wrong "eos_token_id": 2 (id 2 is '#' in the real
            # vocab), and CLIPTextModel special-cases it by pooling at the
            # highest-id token — EOS (49407) is the largest vocab id, so
            # argmax finds it.  Matching the workaround exactly is what
            # keeps converted real checkpoints pooling at the EOS position.
            eos_pos = jnp.argmax(input_ids, axis=-1)
        else:
            eos = (input_ids == cfg.eos_token_id).astype(jnp.int32)
            eos_pos = jnp.argmax(eos, axis=-1)  # first EOS per row
        pooled = x[jnp.arange(b), eos_pos]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(
                cfg.projection_dim,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="text_projection",
            )(pooled)
        return CLIPTextOutput(
            last_hidden_state=x,
            penultimate_hidden_state=penultimate,
            pooled_output=pooled,
        )


class CLIPVisionModel(nn.Module):
    """CLIP vision tower (ViT): patch conv + CLS token + pre/post LayerNorm.

    Returns the projected image embedding [B, projection_dim] (what
    CLIPScore consumes).  Input: [B, H, W, 3], already resized/cropped and
    CLIP-normalized.
    """

    config: CLIPVisionConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        cfg = self.config
        b = pixels.shape[0]
        n_patches = (cfg.image_size // cfg.patch_size) ** 2
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embedding",
        )(pixels.astype(self.dtype))
        x = x.reshape(b, n_patches, cfg.hidden_size)
        cls = self.param(
            "class_embedding",
            nn.initializers.normal(0.02),
            (cfg.hidden_size,),
            self.param_dtype,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(x.dtype), x],
            axis=1,
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (n_patches + 1, cfg.hidden_size),
            self.param_dtype,
        )
        x = x + pos[None].astype(x.dtype)
        x = LayerNorm(
            eps=cfg.layer_norm_eps, param_dtype=self.param_dtype, name="pre_layrnorm"
        )(x)
        x = _scan_encoder_layers(self, cfg, x, None, name="layers")
        pooled = LayerNorm(
            eps=cfg.layer_norm_eps,
            param_dtype=self.param_dtype,
            name="post_layernorm",
        )(x[:, 0])
        return nn.Dense(
            cfg.projection_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="visual_projection",
        )(pooled)
