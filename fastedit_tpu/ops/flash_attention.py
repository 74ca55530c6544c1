"""Pallas TPU flash attention for the UNet/VAE self-attention workloads.

Replaces the cuDNN SDPA the reference inherits through diffusers (and its
attention-slicing memory workaround, src/pipeline.py:178).  Online-softmax
tiling: scores never materialize in HBM — at seq 4096 the XLA reference path
writes/reads a 4096² fp32 score tensor per head; this kernel keeps
everything in VMEM.

Shapes served (SURVEY.md §2.3): self-attention at seq {256, 1024, 4096}
with 64-dim heads, and the VAE mid block at seq 16384 with a single 512-dim
head.  Cross-attention (77-token KV) is tiny and stays on the XLA path by
dispatch (see ops/attention.py).

Grid: (batch*heads, q_blocks, kv_blocks) with kv innermost; running max /
sum / accumulator live in VMEM scratch across the kv iterations (TPU grid
execution is sequential, so scratch persists).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastedit_tpu.ops import flags

# Lane width for the running-stat scratch (TPU min tile is (8, 128)).
_STAT_LANES = 128
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale):
    ikv = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(ikv == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Scale is folded into q (one [BQ, D] multiply) instead of into the
    # [BQ, BKV] score tile — the kernel is VPU-bound at D=64, every
    # elementwise op on the score tile counts.
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)  # [BQ, D]
    k = k_ref[0]  # [BKV, D]
    v = v_ref[0]  # [BKV, D]

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, BKV]

    m_prev = m_ref[:, 0:1]  # [BQ, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)  # [BQ, 1]
    p = jnp.exp(s - m_new)  # [BQ, BKV]

    # Stats live in lane 0 only; a 128-lane broadcast write per kv step is
    # pure VPU/VMEM waste.
    l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:, 0:1] = m_new
    pv = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(ikv == nkv - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, 0:1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def _flash_bhsd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    block_q: int,
    block_kv: int,
) -> jax.Array:
    """q/k/v: [BH, S, D] -> [BH, S, D]."""
    bh, sq, d = q.shape
    skv = k.shape[1]
    grid = (bh, sq // block_q, skv // block_kv)

    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda b, iq, ikv: (b, iq, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_kv, d), lambda b, iq, ikv: (b, ikv, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_kv, d), lambda b, iq, ikv: (b, ikv, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, iq, ikv: (b, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _STAT_LANES), jnp.float32),  # running max
            pltpu.VMEM((block_q, _STAT_LANES), jnp.float32),  # running sum
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
        interpret=flags.FLAGS.pallas_interpret,
    )(q, k, v)


def _pick_blocks(sq: int, skv: int, d: int) -> Optional[tuple[int, int]]:
    """Choose (block_q, block_kv) dividing the sequence lengths, VMEM-sized."""
    # Budget ~6 MB of VMEM for blocks at d<=512.  Sweep on v5e (seq 4096,
    # d 64): bq 512 / bkv 2048 is fastest — 37.6-40.3 TF/s with fori-loop
    # timing (earlier 23.2 figure was inflated by relay sync overhead);
    # bq 1024 collapses.  Variant sweep at this config: exp2 / bf16-exp
    # are neutral; deleting the whole running-max machinery (unsafe)
    # bounds the softmax overhead at ~13%; fusing the row-sum into the PV
    # matmul via a ones-column on V gains only ~3% (within run-to-run
    # noise) — the kernel is near its practical D=64 ceiling, so those
    # variants are not shipped.
    bq_candidates = (512, 256, 128)
    bkv_candidates = (2048, 1024, 512, 256, 128)
    bq = next((b for b in bq_candidates if sq % b == 0 and b <= sq), None)
    bkv = next((b for b in bkv_candidates if skv % b == 0 and b <= skv), None)
    if bq is None or bkv is None:
        return None
    if d > 128:  # shrink for fat heads (VAE: d=512)
        bq, bkv = min(bq, 256), min(bkv, 512)
    return bq, bkv


def supports(q_shape, kv_len: int) -> bool:
    """Can the Pallas kernel serve this attention call?"""
    sq, d = q_shape[1], q_shape[3]
    if sq < 128 or kv_len < 128:
        return False  # tiny sequences (cross-attn 77, smoke models) -> XLA
    if d % 8 != 0:
        return False
    return _pick_blocks(sq, kv_len, d) is not None


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None
) -> jax.Array:
    """Flash attention, BSHD layout: q [B,Sq,H,D], k/v [B,Skv,H,D]."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    blocks = _pick_blocks(sq, skv, d)
    assert blocks is not None, "dispatcher must check supports() first"
    scale = scale if scale is not None else d**-0.5

    def to_bhsd(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)

    out = _flash_bhsd(to_bhsd(q), to_bhsd(k), to_bhsd(v), scale, *blocks)
    return jnp.transpose(out.reshape(b, h, sq, d), (0, 2, 1, 3))
