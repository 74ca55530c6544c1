"""Canny edge detection — jittable JAX implementation + numpy reference.

Replaces the reference's OpenCV binding (``cv2.cvtColor(..., COLOR_RGB2GRAY)``
+ ``cv2.Canny(gray, 100, 200)`` at src/pipeline.py:200-205, SURVEY.md §2.2
E11).  Semantics are **bit-exact vs cv2 5.0** (pinned by
tests/test_canny_cv2.py against the real cv2 installed in the image):

  * RGB -> gray with cv2's shift-15 fixed point:
    ``(R*9798 + G*19235 + B*3735 + 2^14) >> 15``.
  * 3x3 Sobel on integers with replicate border, **L1** gradient magnitude
    (cv2 default ``L2gradient=False``), thresholds floored (and swapped if
    low > high), compared strictly (``mag > low`` / ``mag > high``).
  * Non-maximum suppression with cv2's integer sector test
    (``TG22 = 13573``, shift 15; the 67.5-degree bound is ``tan22 + 2``)
    and cv2's exact tie-breaking: horizontal keeps on
    ``m > left && m >= right``, vertical on ``m > up && m >= down``,
    diagonals strictly on both sides, with the diagonal chosen by the sign
    bit of ``gx ^ gy``.
  * Double threshold + 8-connected hysteresis (iterated masked dilation via
    ``lax.while_loop`` — the TPU-idiomatic form of cv2's sequential flood
    fill; same fixed point).

The JAX version runs inside the device program so a whole edit can be one
XLA computation; ``canny_np`` is the host/golden reference.  An optional
C++ host implementation lives in native/ (see ops/canny_native.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# cv2 RGB2GRAY fixed-point coefficients (BT.601 at shift 15, cv2 5.x).
_GRAY_COEF = (9798, 19235, 3735)
_GRAY_SHIFT = 15
# cv2 canny.cpp: TG22 = round(tan(22.5deg) * 2^15); tan(67.5) == tan(22.5)+2.
_CANNY_SHIFT = 15
_TG22 = 13573


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """[H, W, 3] in [0, 255] -> [H, W] int32 gray, cv2 fixed-point rounding."""
    u = jnp.round(img).astype(jnp.int32) if jnp.issubdtype(
        img.dtype, jnp.floating
    ) else img.astype(jnp.int32)
    r, g, b = u[..., 0], u[..., 1], u[..., 2]
    acc = (
        r * _GRAY_COEF[0]
        + g * _GRAY_COEF[1]
        + b * _GRAY_COEF[2]
        + (1 << (_GRAY_SHIFT - 1))
    )
    return acc >> _GRAY_SHIFT


def _sobel(gray: jax.Array):
    """3x3 Sobel gx, gy (int32) with replicate border (cv2 BORDER_REPLICATE)."""
    g = jnp.pad(gray, 1, mode="edge").astype(jnp.int32)

    def sh(dy, dx):
        return g[1 + dy : 1 + dy + gray.shape[0], 1 + dx : 1 + dx + gray.shape[1]]

    gx = (sh(-1, 1) - sh(-1, -1)) + 2 * (sh(0, 1) - sh(0, -1)) + (sh(1, 1) - sh(1, -1))
    gy = (sh(1, -1) - sh(-1, -1)) + 2 * (sh(1, 0) - sh(-1, 0)) + (sh(1, 1) - sh(-1, 1))
    return gx, gy


def _nms_keep(mag: jax.Array, gx: jax.Array, gy: jax.Array) -> jax.Array:
    """cv2's exact NMS keep-mask along the quantized gradient direction.

    Integer sector test: with x=|gx|, y=|gy|<<15, the direction is
    horizontal if y < x*TG22, vertical if y > x*TG22 + (2x<<15), else one of
    the diagonals picked by the sign bit of gx^gy.  Tie-breaking mirrors
    cv2 canny.cpp: strict against the lexically-earlier neighbor, non-strict
    against the later one for horizontal/vertical, strict both ways on the
    diagonals.
    """
    ax = jnp.abs(gx)
    ay = jnp.abs(gy) << _CANNY_SHIFT
    tg22x = ax * _TG22
    tg67x = tg22x + ((2 * ax) << _CANNY_SHIFT)

    m = jnp.pad(mag, 1, mode="constant")

    def sh(dy, dx):
        return m[1 + dy : 1 + dy + mag.shape[0], 1 + dx : 1 + dx + mag.shape[1]]

    horiz = ay < tg22x
    vert = ay > tg67x
    s_neg = jnp.bitwise_xor(gx, gy) < 0  # diagonal selector, cv2's (xs^ys)<0

    keep_h = (mag > sh(0, -1)) & (mag >= sh(0, 1))
    keep_v = (mag > sh(-1, 0)) & (mag >= sh(1, 0))
    keep_d1 = (mag > sh(-1, -1)) & (mag > sh(1, 1))  # s = +1 (main diagonal)
    keep_d2 = (mag > sh(-1, 1)) & (mag > sh(1, -1))  # s = -1 (anti-diagonal)
    return jnp.where(
        horiz, keep_h, jnp.where(vert, keep_v, jnp.where(s_neg, keep_d2, keep_d1))
    )


def _hysteresis(strong: jax.Array, weak: jax.Array) -> jax.Array:
    """Grow strong edges through 8-connected weak pixels to a fixed point.

    Each while iteration applies 8 dilation+mask steps (propagating edges up
    to 8 px) before re-checking convergence — the fixed-point test is a full
    reduction, so batching propagation steps cuts the sequential-loop length
    ~8x for the same result.
    """

    def dilate(x):
        p = jnp.pad(x, 1)
        h, w = x.shape
        out = x
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                out = out | p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
        return out

    def grow_8(x):
        for _ in range(8):
            x = dilate(x) & weak | x
        return x

    def cond(state):
        cur, changed = state
        return changed

    def body(state):
        cur, _ = state
        grown = grow_8(cur)
        return grown, jnp.any(grown != cur)

    out, _ = jax.lax.while_loop(cond, body, (strong, jnp.asarray(True)))
    return out


def canny_jax(
    image: jax.Array, low_threshold=100.0, high_threshold=200.0
) -> jax.Array:
    """cv2-exact Canny edges. image: [H, W, 3] (or [H, W]) in [0, 255].
    Returns [H, W] uint8 in {0, 255}."""
    if image.ndim == 3:
        gray = rgb_to_gray(image)
    elif jnp.issubdtype(image.dtype, jnp.floating):
        gray = jnp.round(image).astype(jnp.int32)
    else:
        gray = image.astype(jnp.int32)
    low = jnp.floor(jnp.asarray(low_threshold, jnp.float32)).astype(jnp.int32)
    high = jnp.floor(jnp.asarray(high_threshold, jnp.float32)).astype(jnp.int32)
    low, high = jnp.minimum(low, high), jnp.maximum(low, high)
    gx, gy = _sobel(gray)
    mag = jnp.abs(gx) + jnp.abs(gy)  # L1, cv2 default
    keep = _nms_keep(mag, gx, gy)
    cand = keep & (mag > low)
    strong = cand & (mag > high)
    edges = _hysteresis(strong, cand)
    return (edges * 255).astype(jnp.uint8)


# --------------------------------------------------------------------------
# numpy reference (host path + golden for the JAX version)
# --------------------------------------------------------------------------


def canny_np(
    image: np.ndarray, low_threshold=100.0, high_threshold=200.0
) -> np.ndarray:
    """Same cv2-exact algorithm in plain numpy (BFS hysteresis)."""
    img = np.asarray(image)
    if img.ndim == 3:
        u = np.round(img).astype(np.int64) if np.issubdtype(
            img.dtype, np.floating
        ) else img.astype(np.int64)
        acc = (
            u[..., 0] * _GRAY_COEF[0]
            + u[..., 1] * _GRAY_COEF[1]
            + u[..., 2] * _GRAY_COEF[2]
            + (1 << (_GRAY_SHIFT - 1))
        )
        gray = (acc >> _GRAY_SHIFT).astype(np.int32)
    elif np.issubdtype(img.dtype, np.floating):
        gray = np.round(img).astype(np.int32)
    else:
        gray = img.astype(np.int32)
    low = int(np.floor(low_threshold))
    high = int(np.floor(high_threshold))
    if low > high:
        low, high = high, low

    g = np.pad(gray, 1, mode="edge")
    h, w = gray.shape

    def sh(dy, dx):
        return g[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    gx = (sh(-1, 1) - sh(-1, -1)) + 2 * (sh(0, 1) - sh(0, -1)) + (sh(1, 1) - sh(1, -1))
    gy = (sh(1, -1) - sh(-1, -1)) + 2 * (sh(1, 0) - sh(-1, 0)) + (sh(1, 1) - sh(-1, 1))
    mag = np.abs(gx) + np.abs(gy)

    ax = np.abs(gx)
    ay = np.abs(gy) << _CANNY_SHIFT
    tg22x = ax * _TG22
    tg67x = tg22x + ((2 * ax) << _CANNY_SHIFT)
    m = np.pad(mag, 1)

    def shm(dy, dx):
        return m[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    horiz = ay < tg22x
    vert = ay > tg67x
    s_neg = np.bitwise_xor(gx, gy) < 0
    keep_h = (mag > shm(0, -1)) & (mag >= shm(0, 1))
    keep_v = (mag > shm(-1, 0)) & (mag >= shm(1, 0))
    keep_d1 = (mag > shm(-1, -1)) & (mag > shm(1, 1))
    keep_d2 = (mag > shm(-1, 1)) & (mag > shm(1, -1))
    keep = np.where(
        horiz, keep_h, np.where(vert, keep_v, np.where(s_neg, keep_d2, keep_d1))
    )

    cand = keep & (mag > low)
    strong = cand & (mag > high)
    # BFS from strong pixels through candidate ones.
    visited = strong.copy()
    stack = list(zip(*np.nonzero(strong)))
    while stack:
        y, x = stack.pop()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w and cand[ny, nx] and not visited[ny, nx]:
                    visited[ny, nx] = True
                    stack.append((ny, nx))
    return (visited * 255).astype(np.uint8)
