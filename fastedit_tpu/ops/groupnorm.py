"""GroupNorm (+ optional fused SiLU) for NHWC tensors.

The dominant non-matmul op in the UNet/VAE resnet blocks (SURVEY.md §2.3
native tier item 2).  XLA reference here; the Pallas fused kernel lives in
``ops/fused_groupnorm.py`` and is selected by ``ops.flags``.

Statistics are computed in fp32 (bf16 inputs upcast) over (H, W, C/G).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastedit_tpu.ops import flags


def group_norm_xla(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: str | None = None,
) -> jax.Array:
    """x: [..., H, W, C] (NHWC); gamma/beta: [C]. act in {None, 'silu'}.

    Measurement note (v5e, bench_conv.py chain mode with fori_loop timing):
    XLA compiles this reshape-formulation to within ~2x of the HBM roofline
    at every pipeline shape when it feeds a conv (0.03-1.5 ms overhead).  A
    hand "layout-friendly" C-minor-stats rewrite measured equal on 6/7
    shapes and 2.6 ms WORSE at 256²x512, so it was reverted.  (Unrolled-
    loop timing had suggested a 9 ms GroupNorm cost at 1024²x128 — that was
    a measurement artifact of the axon relay's ~25 ms/sync floor.)
    """
    orig_dtype = x.dtype
    *lead, h, w, c = x.shape
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    xf = x.astype(jnp.float32).reshape(*lead, h, w, num_groups, c // num_groups)
    axes = tuple(range(len(lead), len(lead) + 2)) + (len(lead) + 3,)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(*lead, h, w, c)
    out = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    elif act is not None:
        raise ValueError(f"unsupported activation {act!r}")
    return out.astype(orig_dtype)


def group_norm_scale_shift(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
) -> tuple[jax.Array, jax.Array]:
    """Per-(batch, channel) affine folding GroupNorm stats with gamma/beta.

    Returns f32 ``(scale, shift)`` [B, C] such that
    ``GN(x)[b,h,w,c] == x[b,h,w,c] * scale[b,c] + shift[b,c]``.

    This is the prologue-side half of the fused resnet conv
    (ops/conv_fused.py): one XLA reduction pass over the raw input replaces
    the full normalize+activate+materialize round trip — the elementwise map
    happens inside the conv kernel's VMEM tile.
    """
    b, h, w, c = x.shape
    g = num_groups
    assert c % g == 0
    xf = x.astype(jnp.float32).reshape(b, h * w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 3))  # [B, G]
    # Two-pass variance, matching group_norm_xla: the single-pass
    # E[x^2]-E[x]^2 form cancels catastrophically in f32 when |mean| >>
    # std (late decoder blocks), and the fused path is default-on there.
    var = jnp.mean(
        jnp.square(xf - mean[:, None, :, None]), axis=(1, 3)
    )
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, c // g, axis=1)  # [B, C]
    rstd_c = jnp.repeat(rstd, c // g, axis=1)
    gamma_f = gamma.astype(jnp.float32)[None, :]
    beta_f = beta.astype(jnp.float32)[None, :]
    scale = rstd_c * gamma_f
    shift = beta_f - mean_c * scale
    return scale, shift


def group_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: str | None = None,
) -> jax.Array:
    """Dispatching GroupNorm entry point used by all models."""
    if flags.use_pallas_groupnorm():
        from fastedit_tpu.ops.fused_groupnorm import fused_group_norm

        return fused_group_norm(x, gamma, beta, num_groups=num_groups, eps=eps, act=act)
    return group_norm_xla(x, gamma, beta, num_groups=num_groups, eps=eps, act=act)
