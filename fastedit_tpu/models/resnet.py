"""ResNet blocks and resampling layers (NHWC) for UNet / ControlNet / VAE."""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fastedit_tpu.models.layers import GroupNorm
from fastedit_tpu.ops.conv import conv3x3_same


class Conv3x3(nn.Module):
    """3x3 stride-1 SAME conv with nn.Conv-compatible params ("kernel" of
    [3, 3, Cin, Cout] HWIO + "bias"), dispatched through
    ``ops.conv.conv3x3_same``: Pallas shift-and-matmul kernel when
    flags.use_pallas_conv() is on in the tracing context (the denoise
    loop turns it on via flags.use_pallas_conv_denoise — see
    pipeline/stages.py and ops/conv.py), XLA otherwise.  Checkpoint
    converters and param trees are unaffected — the param names and
    shapes match nn.Conv exactly.

    Optional fused-resnet operands (ops/conv_fused.conv3x3_fused; each
    falls back to the identical unfused XLA computation when the fused
    kernel is off or the shape unsupported):

    * ``prenorm``: f32 ``(scale, shift)`` [B, Cin] — input is mapped
      through ``silu(x*scale + shift)`` before the taps (GroupNorm+SiLU
      with stats precomputed, see GroupNorm(scale_shift=True)).
    * ``extra_bias``: [B, Cout] per-batch add (time-embedding fold).
    * ``skip``: [B, H, W, Cout] residual added after bias.
    * ``up2``: nearest-2x upsample before the conv (phase-decomposed
      kernel — no materialized 4x tensor; ops/conv_fused.conv3x3_up2).
    """

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        prenorm: Optional[tuple[jax.Array, jax.Array]] = None,
        extra_bias: Optional[jax.Array] = None,
        skip: Optional[jax.Array] = None,
        up2: bool = False,
    ) -> jax.Array:
        from fastedit_tpu.ops import conv_fused, flags

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, cin, self.features), self.param_dtype
        )
        bias = self.param("bias", self.bias_init, (self.features,), self.param_dtype)
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)

        if up2:
            assert prenorm is None and extra_bias is None and skip is None
            if flags.use_fused_up2() and conv_fused.supports_up2(
                x.shape, kernel.shape, x.dtype.itemsize
            ):
                return conv_fused.conv3x3_up2(x, kernel, bias=bias)
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            return conv3x3_same(x, kernel, bias=bias.astype(self.dtype))

        if prenorm is None and extra_bias is None and skip is None:
            return conv3x3_same(x, kernel, bias=bias.astype(self.dtype))

        if extra_bias is not None:
            bias_eff = bias.astype(jnp.float32)[None, :] + extra_bias.astype(
                jnp.float32
            )  # [B, Cout]
        else:
            bias_eff = bias
        if flags.use_fused_resnet() and conv_fused.supports_fused(
            x.shape, kernel.shape, x.dtype.itemsize, skip is not None
        ):
            return conv_fused.conv3x3_fused(
                x, kernel, bias=bias_eff, prenorm=prenorm, skip=skip
            )
        # Unfused fallback: same math as the kernel, op by op.
        if prenorm is not None:
            scale, shift = prenorm
            xf = x.astype(jnp.float32)
            y = xf * scale[:, None, None, :] + shift[:, None, None, :]
            x = (y * jax.nn.sigmoid(y)).astype(self.dtype)
        out = conv3x3_same(x, kernel, bias=None)
        if bias_eff.ndim == 2:
            out = out + bias_eff[:, None, None, :].astype(out.dtype)
        else:
            out = out + bias_eff.astype(out.dtype)
        if skip is not None:
            out = out + skip.astype(out.dtype)
        return out.astype(self.dtype)


class Conv1x1(nn.Module):
    """1x1 conv with layout-matched lowering and nn.Conv-compatible params
    ("kernel" [1, 1, Cin, Cout] HWIO + "bias").

    The formulation must match its neighborhood: a 1x1 nn.Conv lowers to
    an XLA convolution, which on TPU prefers the {3,0,2,1:T(2,128)}
    layout, while a dot keeps the default row-major T(8,128) layout.  In
    a Pallas-conv region (custom-calls are row-major by construction) the
    conv form costs a full-tensor relayout copy at every resnet shortcut
    (profiled 2.6-3.5 ms each in the VAE decoder); in an XLA-conv region
    the dot form costs the mirror-image relayouts (decoder 153 vs 129 ms
    measured).  Both forms are numerically identical (same contraction,
    f32 accumulate), so dispatch follows flags.use_pallas_conv() at trace
    time, exactly like Conv3x3."""

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from fastedit_tpu.ops import flags

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (1, 1, cin, self.features), self.param_dtype
        )
        bias = self.param("bias", self.bias_init, (self.features,), self.param_dtype)
        if flags.use_pallas_conv():
            out = jax.lax.dot_general(
                x.astype(self.dtype),
                kernel[0, 0].astype(self.dtype),
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
        return (out + bias.astype(jnp.float32)).astype(self.dtype)


def _conv(features: int, kernel: int, stride: int = 1, pad: int | str = "SAME", **kw):
    if kernel == 3 and stride == 1 and pad == "SAME":
        return Conv3x3(features, **kw)
    if kernel == 1 and stride == 1:
        return Conv1x1(features, **kw)
    padding = pad if isinstance(pad, str) else [(pad, pad), (pad, pad)]
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        **kw,
    )


class ResnetBlock2D(nn.Module):
    """GN+SiLU -> conv3x3 -> (+time emb) -> GN+SiLU -> conv3x3 -> +shortcut."""

    out_channels: int
    use_time_emb: bool = True
    groups: int = 32
    eps: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, temb: Optional[jax.Array] = None
    ) -> jax.Array:
        from fastedit_tpu.ops import conv_fused, flags

        conv = partial(_conv, dtype=self.dtype, param_dtype=self.param_dtype)
        in_channels = x.shape[-1]
        norm1 = GroupNorm(num_groups=self.groups, eps=self.eps, act="silu", name="norm1")
        norm2 = GroupNorm(num_groups=self.groups, eps=self.eps, act="silu", name="norm2")
        conv1 = conv(self.out_channels, 3, name="conv1")
        conv2 = conv(self.out_channels, 3, name="conv2")

        t = None
        if self.use_time_emb:
            assert temb is not None, "time embedding required"
            t = nn.Dense(
                self.out_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="time_emb_proj",
            )(jax.nn.silu(temb))

        itemsize = jnp.dtype(self.dtype).itemsize
        out_shape = (*x.shape[:-1], self.out_channels)
        fused = (
            flags.use_fused_resnet()
            and isinstance(conv1, Conv3x3)
            and conv_fused.supports_fused(
                x.shape, (3, 3, in_channels, self.out_channels), itemsize
            )
            and conv_fused.supports_fused(
                out_shape, (3, 3, self.out_channels, self.out_channels),
                itemsize, True,
            )
        )
        if fused:
            # Whole-block fusion: GN stats stay XLA reductions over the raw
            # tensors; the normalize+SiLU map, time-embedding bias, and the
            # residual add all ride inside the two conv kernels' VMEM tiles
            # (one HBM round trip per conv — ops/conv_fused.py).
            shortcut = (
                conv(self.out_channels, 1, name="conv_shortcut")(x)
                if in_channels != self.out_channels
                else x
            )
            h = conv1(x, prenorm=norm1(x, scale_shift=True), extra_bias=t)
            return conv2(h, prenorm=norm2(h, scale_shift=True), skip=shortcut)

        h = norm1(x)
        h = conv1(h)
        if t is not None:
            h = h + t[:, None, None, :]
        h = norm2(h)
        h = conv2(h)
        if in_channels != self.out_channels:
            x = conv(self.out_channels, 1, name="conv_shortcut")(x)
        return x + h


class StridedConv3x3(nn.Module):
    """Stride-2 3x3 conv with nn.Conv-compatible params ("kernel" HWIO +
    "bias"), dispatched to the phase-decomposed Pallas downsample kernel
    (ops/conv_fused.conv3x3_down2) when flags.use_fused_down2() is on in
    the tracing context and the shape qualifies; XLA strided conv
    otherwise.  Covers both paddings: SAME-style (1,1) and the VAE
    encoder's asymmetric (0,1)."""

    features: int
    asymmetric: bool = False
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from fastedit_tpu.ops import conv_fused, flags

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, cin, self.features), self.param_dtype
        )
        bias = self.param("bias", self.bias_init, (self.features,), self.param_dtype)
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if flags.use_fused_down2() and conv_fused.supports_down2(
            x.shape, kernel.shape, x.dtype.itemsize
        ):
            return conv_fused.conv3x3_down2(
                x, kernel, bias=bias.astype(self.dtype),
                asymmetric=self.asymmetric,
            )
        pad = [(0, 1), (0, 1)] if self.asymmetric else [(1, 1), (1, 1)]
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(2, 2),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(out.dtype)


class Downsample2D(nn.Module):
    """Strided conv downsample. VAE encoder uses asymmetric (0,1) padding."""

    out_channels: int
    asymmetric_pad: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return StridedConv3x3(
            self.out_channels,
            asymmetric=self.asymmetric_pad,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class Upsample2D(nn.Module):
    """Nearest x2 (exact, via repeat) then conv3x3."""

    out_channels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # up2=True dispatches the phase-decomposed fused upsample+conv
        # kernel when flags/shape allow; Conv3x3 otherwise materializes
        # the exact nearest-2x repeat and runs the plain conv.
        return _conv(
            self.out_channels,
            3,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x, up2=True)
