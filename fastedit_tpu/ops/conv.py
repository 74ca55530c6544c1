"""Dispatching 3x3 SAME stride-1 conv: per-stage Pallas/XLA policy.

The Pallas shift-and-matmul kernel (ops/conv3x3.py) is 2-3.5x faster
than XLA's conv lowering per-op in-graph (profiled 1.6 vs 24 ms at the
VAE decoder's big layers), but mixing it with XLA convs starts a LAYOUT
WAR: custom-calls are row-major T(8,128) while XLA convs prefer
{3,0,2,1:T(2,128)}, and the relayout copies (folded into neighboring
reduce fusions) dwarf the kernel's win (decoder 241 vs 128 ms with
partial coverage).  With full shape coverage (13 MB VMEM tile budget +
small-cout tails) the war inside a region disappears:

  * denoise loop (UNet+ControlNet): Pallas wins, 291.5 vs 303.7 ms for
    the 3-step CFG denoise -> ON by default on TPU
    (flags.use_pallas_conv_denoise, applied at trace time by
    pipeline/stages.py).
  * one-shot VAE decoder: XLA still wins, 128.6 vs 138.2 ms (the
    nearest-2x upsamples fuse into XLA's convs but must materialize
    before a custom-call) -> OFF by default elsewhere
    (flags.use_pallas_conv).

Conv1x1 (models/resnet.py) follows the same flag so the 1x1 shortcuts
never fight the surrounding formulation.  Shapes the kernel doesn't
serve (cin not divisible by 128, VMEM-oversized tiles, tiny smoke
models, CPU) take the XLA path with identical semantics.
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

        if k.supports(x.shape, kernel.shape, x.dtype.itemsize):
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
