"""Dispatching 3x3 SAME stride-1 conv: opt-in Pallas kernel, XLA default.

The Pallas shift-and-matmul kernel (ops/conv3x3.py) measures 1.05-1.80x
XLA's conv lowering *standalone* across the pipeline shapes on v5e
(bench_conv.py, fori-loop timing; biggest wins at the VAE decoder's
large-spatial layers).  In context the margin evaporates: XLA fuses the
preceding GroupNorm+SiLU apply into its own conv, so the resnet
double-conv chain measures 1.00-1.04x and the full VAE decoder 1.9x
SLOWER with the kernel on (244 vs 127 ms; end-to-end 0.86 vs 0.73
s/edit).  Hence default-off (ops.flags honest-flag policy); shapes the
kernel doesn't serve (channels not divisible by 128, VMEM-oversized
tiles, tiny smoke models, CPU) always take the XLA path with identical
semantics.
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
