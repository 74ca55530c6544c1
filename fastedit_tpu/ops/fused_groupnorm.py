"""Pallas fused GroupNorm(+SiLU) over NHWC — three-phase tiled reduction.

SURVEY.md §2.3 native-tier item 2.  A GroupNorm needs global (H, W, C/G)
statistics, so a tiled kernel runs phases over the same H-tiles (TPU grid
cells execute sequentially, scratch persists):

  phase 0: accumulate per-group sums into VMEM scratch;
  phase 1: with the mean known, accumulate per-group Σ(x-mean)²
           (two-pass variance: the one-pass E[x²]-E[x]² form cancels
           catastrophically in f32 when |mean| >> std — late decoder
           blocks; same reason ops/groupnorm.py's XLA path is two-pass);
  phase 2: re-read each tile, normalize + affine (+ SiLU), write out.

Memory traffic is 3 reads + 1 write — no better than XLA's unfused
reduce+normalize chain, so this kernel is an *opt-in* (ops/flags.py
defaults it off unless benchmarked faster on the target shape; see
bench_kernels.py)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastedit_tpu.ops import flags
from fastedit_tpu.ops.groupnorm import group_norm_xla

_STAT_ROWS = 8  # min sublane tile; row 0 = sum, row 1 = sum of squares


def _gn_kernel(x_ref, gamma_ref, beta_ref, o_ref, stats_ref, *,
               num_groups, eps, act, n_per_group):
    phase = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # [Ht, W, C]
    ht, w, c = x.shape
    cg = c // num_groups

    # Group-membership matrix [C, G] (ones where channel c is in group g).
    # Channel<->group reduction/broadcast go through tiny matmuls — Mosaic
    # rejects 1-D -> (G, C/G) reshapes with unaligned lane dims.
    member = (
        jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
        == jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    ).astype(jnp.float32)

    @pl.when(jnp.logical_and(phase == 0, pl.program_id(2) == 0))
    def _init():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    n = jnp.float32(n_per_group)

    @pl.when(phase == 0)
    def _accumulate_sum():
        flat = x.reshape(ht * w, c)
        csum = jnp.sum(flat, axis=0, keepdims=True)  # [1, C]
        gsum = jnp.dot(csum, member, preferred_element_type=jnp.float32)
        stats_ref[0:1, :num_groups] += gsum

    @pl.when(phase == 1)
    def _accumulate_centered_sumsq():
        # mean is global now (phase 0 saw every tile); accumulating the
        # CENTERED squares is what makes the variance two-pass.
        mean_g = stats_ref[0:1, :num_groups] / n  # [1, G]
        mean_c = jnp.dot(mean_g, member.T, preferred_element_type=jnp.float32)
        d = x.reshape(ht * w, c) - mean_c  # [Ht*W, C]
        csq = jnp.sum(d * d, axis=0, keepdims=True)
        stats_ref[1:2, :num_groups] += jnp.dot(
            csq, member, preferred_element_type=jnp.float32
        )

    @pl.when(phase == 2)
    def _normalize():
        mean_g = stats_ref[0:1, :num_groups] / n  # [1, G]
        var_g = stats_ref[1:2, :num_groups] / n
        inv_g = jax.lax.rsqrt(var_g + eps)
        # broadcast back to channels via member^T: [1, G] @ [G, C] -> [1, C]
        mean_c = jnp.dot(mean_g, member.T, preferred_element_type=jnp.float32)
        inv_c = jnp.dot(inv_g, member.T, preferred_element_type=jnp.float32)
        gamma = gamma_ref[0:1].astype(jnp.float32)
        beta = beta_ref[0:1].astype(jnp.float32)
        scale = (inv_c * gamma)[0]  # [C]
        shift = (beta - mean_c * inv_c * gamma)[0]
        y = x * scale + shift
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "act", "block_h")
)
def _fused_gn_4d(x, gamma, beta, num_groups, eps, act, block_h):
    b, h, w, c = x.shape
    grid = (b, 3, h // block_h)
    kernel = functools.partial(
        _gn_kernel,
        num_groups=num_groups,
        eps=eps,
        act=act,
        n_per_group=h * w * (c // num_groups),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_h, w, c), lambda b, p, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, c), lambda b, p, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, p, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_h, w, c), lambda b, p, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((_STAT_ROWS, 128), jnp.float32)],
        interpret=flags.FLAGS.pallas_interpret,
    )(x, gamma.reshape(1, c), beta.reshape(1, c))


def _pick_block_h(h: int, w: int, c: int, itemsize: int) -> int | None:
    budget = 6 * 1024 * 1024  # VMEM budget for in+out blocks
    for bh in (64, 32, 16, 8, 4, 2, 1):
        if h % bh == 0 and 2 * bh * w * c * max(itemsize, 4) <= budget:
            return bh
    return None


def supports(shape, num_groups: int) -> bool:
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    if c % num_groups != 0 or num_groups > 128:
        return False
    return _pick_block_h(h, w, c, 4) is not None


def fused_group_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: str | None = None,
) -> jax.Array:
    if not supports(x.shape, num_groups):
        return group_norm_xla(x, gamma, beta, num_groups, eps, act)
    block_h = _pick_block_h(x.shape[1], x.shape[2], x.shape[3], x.dtype.itemsize)
    return _fused_gn_4d(x, gamma, beta, num_groups, float(eps), act, block_h)
