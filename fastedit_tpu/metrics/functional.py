"""Pure-JAX image metrics: SSIM, PSNR, MSE.

Drop-in numerical equivalents of the torchmetrics calls the reference makes
in src/metrics.py:174-194 (SURVEY.md §2.2 E10):
  * SSIM: gaussian 11x11 kernel, sigma 1.5, k1=0.01, k2=0.03,
    data_range=1.0, per-channel then mean (torchmetrics defaults).
  * PSNR: 10*log10(data_range^2 / mse) with mse over the full batch.
  * MSE: plain mean squared error over flattened tensors.

Inputs are [B, H, W, C] (NHWC) floats in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(kernel_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """1-D gaussian, normalized to sum 1 (matches torchmetrics windows)."""
    coords = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Mean SSIM over the batch. img*: [B, H, W, C] in [0, data_range].

    Valid-region convolution (no padding), like torchmetrics: statistics are
    computed with a separable gaussian window and the SSIM map is averaged
    over the valid output area.
    """
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    b, h, w, c = x.shape
    win = jnp.asarray(_gaussian_kernel(kernel_size, sigma))

    def blur(t: jax.Array) -> jax.Array:
        # separable depthwise conv, VALID padding.  Precision HIGHEST is
        # load-bearing on TPU: XLA lowers f32 convs to bf16 passes by
        # default, which costs ~3 decimal digits in the gaussian moments —
        # sigma = E[x^2] - mu^2 then cancels catastrophically and the SSIM
        # denominator goes singular (observed SSIM ~12.8 on a real image
        # pair vs 0.457 in true f32; CPU is unaffected, so CPU-only golden
        # tests cannot catch it).
        t = jnp.moveaxis(t, -1, 1).reshape(b * t.shape[-1], 1, h, w)
        kh = win.reshape(1, 1, kernel_size, 1)
        kw = win.reshape(1, 1, 1, kernel_size)
        hi = jax.lax.Precision.HIGHEST
        t = jax.lax.conv_general_dilated(t, kh, (1, 1), "VALID", precision=hi)
        t = jax.lax.conv_general_dilated(t, kw, (1, 1), "VALID", precision=hi)
        hh, ww = t.shape[-2:]
        return jnp.moveaxis(t.reshape(b, c, hh, ww), 1, -1)

    mu_x = blur(x)
    mu_y = blur(y)
    mu_xx = blur(x * x)
    mu_yy = blur(y * y)
    mu_xy = blur(x * y)

    sigma_x = mu_xx - mu_x * mu_x
    sigma_y = mu_yy - mu_y * mu_y
    sigma_xy = mu_xy - mu_x * mu_y

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


def psnr(img1: jax.Array, img2: jax.Array, data_range: float = 1.0) -> jax.Array:
    m = jnp.mean(
        jnp.square(img1.astype(jnp.float32) - img2.astype(jnp.float32))
    )
    return 10.0 * jnp.log10(data_range**2 / m)


def mse(img1: jax.Array, img2: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(img1.astype(jnp.float32) - img2.astype(jnp.float32)))
