"""LPIPS with the SqueezeNet backbone (Flax).

Equivalent of ``LearnedPerceptualImagePatchSimilarity(net_type='squeeze')``
bound at reference src/metrics.py:179-181 (SURVEY.md §2.2 E10): SqueezeNet
1.1 features tapped after 7 stages, channel-unit-normalized differences,
learned 1x1 linear heads, spatial mean, summed over stages.

Inputs: [B, H, W, 3] in [-1, 1] (the reference converts to that range at
src/metrics.py:262-264).  Real weights come from the checkpoint converter
(torchvision squeezenet1_1 + the LPIPS linear heads); tests run random
weights and check metric properties.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# ImageNet-ish scaling baked into LPIPS (shift/scale applied to [-1,1] input).
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# SqueezeNet 1.1 feature-tap channel widths, one per LPIPS stage.
SQUEEZE_CHANNELS = (64, 128, 256, 384, 384, 512, 512)


class Fire(nn.Module):
    """SqueezeNet fire module: 1x1 squeeze -> parallel 1x1 + 3x3 expand."""

    squeeze: int
    expand: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, dtype=self.dtype)
        x = jax.nn.relu(conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = jax.nn.relu(conv(self.expand, (1, 1), name="expand1x1")(x))
        e3 = jax.nn.relu(
            conv(self.expand, (3, 3), padding=[(1, 1), (1, 1)], name="expand3x3")(x)
        )
        return jnp.concatenate([e1, e3], axis=-1)


def _maxpool(x):
    # torch MaxPool2d(kernel=3, stride=2, ceil_mode=False)
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class SqueezeNetFeatures(nn.Module):
    """SqueezeNet 1.1 feature extractor returning the 7 LPIPS taps."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, ...]:
        conv = partial(nn.Conv, dtype=self.dtype)
        fire = partial(Fire, dtype=self.dtype)
        taps = []
        # features[0:2]: conv 3x3 stride 2 (no padding) + relu
        x = jax.nn.relu(
            conv(64, (3, 3), strides=(2, 2), padding="VALID", name="conv1")(x)
        )
        taps.append(x)
        x = _maxpool(x)
        x = fire(16, 64, name="fire3")(x)
        x = fire(16, 64, name="fire4")(x)
        taps.append(x)
        x = _maxpool(x)
        x = fire(32, 128, name="fire6")(x)
        x = fire(32, 128, name="fire7")(x)
        taps.append(x)
        x = _maxpool(x)
        x = fire(48, 192, name="fire9")(x)
        taps.append(x)
        x = fire(48, 192, name="fire10")(x)
        taps.append(x)
        x = fire(64, 256, name="fire11")(x)
        taps.append(x)
        x = fire(64, 256, name="fire12")(x)
        taps.append(x)
        return tuple(taps)


class LPIPS(nn.Module):
    """Full LPIPS distance: d(x, y) per image [B], inputs in [-1, 1], NHWC."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT, dtype=jnp.float32)
        scale = jnp.asarray(_SCALE, dtype=jnp.float32)
        net = SqueezeNetFeatures(dtype=self.dtype, name="net")

        def normed_feats(img):
            img = (img.astype(jnp.float32) - shift) / scale
            feats = net(img)
            out = []
            for f in feats:
                f = f.astype(jnp.float32)
                norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True)) + 1e-10
                out.append(f / norm)
            return out

        fx = normed_feats(x)
        fy = normed_feats(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            diff = jnp.square(a - b)
            head = nn.Conv(
                1, (1, 1), use_bias=False, dtype=jnp.float32, name=f"lin{i}"
            )(diff)
            total = total + jnp.mean(head, axis=(1, 2, 3))
        return total  # [B]
