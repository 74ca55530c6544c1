"""Dispatching 3x3 SAME stride-1 conv: Pallas kernel on TPU, XLA elsewhere.

The Pallas shift-and-matmul kernel (ops/conv3x3.py) measures 1.05-1.65x
XLA's conv lowering across the pipeline shapes on v5e (bench_conv.py,
fori-loop timing; biggest wins at the VAE decoder's large-spatial layers:
1.45x at 512²x256, 1.65x at 1024²x128).  Shapes the kernel doesn't serve
(channels not divisible by 128, tiny smoke models, CPU) fall back to the
XLA reference with identical semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fastedit_tpu.ops import flags


def conv3x3_same(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    act: Optional[str] = None,
) -> jax.Array:
    """NHWC x [B,H,W,Cin] * [3,3,Cin,Cout] + bias (+ optional fused SiLU)."""
    if flags.use_pallas_conv():
        from fastedit_tpu.ops import conv3x3 as k

        if k.supports(x.shape, kernel.shape):
            return k.conv3x3(x, kernel, bias=bias, act=act)

    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    elif act is not None:
        raise ValueError(f"unsupported activation {act!r}")
    return out.astype(x.dtype)
