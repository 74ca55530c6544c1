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
    shapes match nn.Conv exactly."""

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, cin, self.features), self.param_dtype
        )
        bias = self.param("bias", self.bias_init, (self.features,), self.param_dtype)
        return conv3x3_same(
            x.astype(self.dtype), kernel.astype(self.dtype), bias.astype(self.dtype)
        )


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
        conv = partial(_conv, dtype=self.dtype, param_dtype=self.param_dtype)
        in_channels = x.shape[-1]
        h = GroupNorm(num_groups=self.groups, eps=self.eps, act="silu", name="norm1")(x)
        h = conv(self.out_channels, 3, name="conv1")(h)
        if self.use_time_emb:
            assert temb is not None, "time embedding required"
            t = nn.Dense(
                self.out_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="time_emb_proj",
            )(jax.nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm(num_groups=self.groups, eps=self.eps, act="silu", name="norm2")(h)
        h = conv(self.out_channels, 3, name="conv2")(h)
        if in_channels != self.out_channels:
            x = conv(self.out_channels, 1, name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    """Strided conv downsample. VAE encoder uses asymmetric (0,1) padding."""

    out_channels: int
    asymmetric_pad: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.asymmetric_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad: int | str = 0
        else:
            pad = 1
        return _conv(
            self.out_channels,
            3,
            stride=2,
            pad=pad,
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
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _conv(
            self.out_channels,
            3,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
