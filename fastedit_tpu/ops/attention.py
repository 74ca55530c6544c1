"""Scaled-dot-product attention: XLA reference now, Pallas flash kernel behind a flag.

Replaces the cuDNN SDPA the reference inherits via diffusers (and its
``enable_attention_slicing`` memory workaround at reference
src/pipeline.py:178 — unnecessary on TPU with flash attention).

Layout convention: ``[batch, seq, heads, head_dim]`` (BSHD).  UNet workloads:
self-attention at seq ∈ {4096, 1024, 256} with head_dim 64, cross-attention
with 77-token KV; VAE mid-block single-head seq 16384 (at 1024² inputs).

Softmax runs in fp32 regardless of input dtype (bf16-parity hard part #1 in
SURVEY.md §7).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fastedit_tpu.ops import flags


def attention_xla(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None
) -> jax.Array:
    """Reference attention. q: [B,Sq,H,D]; k/v: [B,Skv,H,D] -> [B,Sq,H,D]."""
    *_, d = q.shape
    scale = scale if scale is not None else d**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None
) -> jax.Array:
    """Dispatching attention entry point used by all models.

    Pallas flash kernel for the big self-attention shapes; XLA reference for
    everything it doesn't serve (77-token cross-attention KV, tiny smoke
    models) — see flash_attention.supports().
    """
    if flags.use_pallas_attention():
        from fastedit_tpu.ops import flash_attention as fa

        if fa.supports(q.shape, k.shape[1]):
            return fa.flash_attention(q, k, v, scale=scale)
    return attention_xla(q, k, v, scale=scale)
