"""Canny edge detection — jittable JAX implementation + numpy reference.

Replaces the reference's OpenCV binding (``cv2.Canny(gray, 100, 200)`` at
src/pipeline.py:205, SURVEY.md §2.2 E11).  OpenCV semantics reproduced:

  * RGB -> gray with BT.601 weights (cv2.COLOR_RGB2GRAY).
  * 3x3 Sobel with replicate border, **L1** gradient magnitude (cv2 default
    ``L2gradient=False``).
  * 4-direction non-maximum suppression with the 22.5 deg sector rule.
  * Double threshold + 8-connected hysteresis (iterated masked dilation via
    ``lax.while_loop`` — the TPU-idiomatic form of cv2's sequential flood
    fill).

The JAX version runs inside the device program so a whole edit can be one
XLA computation; ``canny_np`` is the host/golden reference.  An optional
C++ host implementation lives in native/ (see ops/canny_native.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# cv2.COLOR_RGB2GRAY coefficients (BT.601).
_GRAY_W = (0.299, 0.587, 0.114)


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """[H, W, 3] float in [0, 255] -> [H, W] gray, cv2 rounding."""
    w = jnp.asarray(_GRAY_W, dtype=jnp.float32)
    return jnp.round(jnp.tensordot(img.astype(jnp.float32), w, axes=1))


def _sobel(gray: jax.Array):
    """3x3 Sobel gx, gy with replicate border (cv2 BORDER_REPLICATE)."""
    g = jnp.pad(gray, 1, mode="edge").astype(jnp.float32)
    # gx = [[-1,0,1],[-2,0,2],[-1,0,1]], gy = transpose.
    def sh(dy, dx):
        return g[1 + dy : 1 + dy + gray.shape[0], 1 + dx : 1 + dx + gray.shape[1]]

    gx = (
        (sh(-1, 1) - sh(-1, -1))
        + 2.0 * (sh(0, 1) - sh(0, -1))
        + (sh(1, 1) - sh(1, -1))
    )
    gy = (
        (sh(1, -1) - sh(-1, -1))
        + 2.0 * (sh(1, 0) - sh(-1, 0))
        + (sh(1, 1) - sh(-1, 1))
    )
    return gx, gy


def _nms(mag: jax.Array, gx: jax.Array, gy: jax.Array) -> jax.Array:
    """Suppress non-maxima along the quantized gradient direction.

    Sector selection mirrors cv2: with ax=|gx|, ay=|gy|, direction is
    horizontal if ay < ax*tan(22.5), vertical if ay > ax*tan(67.5), else one
    of the diagonals by gradient sign agreement.
    """
    TAN22 = 0.4142135623730951
    TAN67 = 2.414213562373095
    ax, ay = jnp.abs(gx), jnp.abs(gy)

    m = jnp.pad(mag, 1, mode="constant")

    def sh(dy, dx):
        return m[1 + dy : 1 + dy + mag.shape[0], 1 + dx : 1 + dx + mag.shape[1]]

    horiz = ay <= ax * TAN22  # gradient ~horizontal -> compare left/right
    vert = ay > ax * TAN67  # gradient ~vertical -> compare up/down
    diag_same = jnp.sign(gx) == jnp.sign(gy)  # 135deg edge normal
    # neighbor pairs per sector
    n_h = jnp.maximum(sh(0, 1), sh(0, -1))
    n_v = jnp.maximum(sh(1, 0), sh(-1, 0))
    n_d1 = jnp.maximum(sh(1, 1), sh(-1, -1))  # gradient along main diagonal
    n_d2 = jnp.maximum(sh(1, -1), sh(-1, 1))
    neighbor = jnp.where(
        horiz, n_h, jnp.where(vert, n_v, jnp.where(diag_same, n_d1, n_d2))
    )
    return jnp.where(mag >= neighbor, mag, 0.0)


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
    image: jax.Array, low_threshold: float = 100.0, high_threshold: float = 200.0
) -> jax.Array:
    """Canny edges. image: [H, W, 3] (or [H, W]) in [0, 255]. Returns
    [H, W] uint8 in {0, 255}."""
    gray = rgb_to_gray(image) if image.ndim == 3 else image.astype(jnp.float32)
    gx, gy = _sobel(gray)
    mag = jnp.abs(gx) + jnp.abs(gy)  # L1, cv2 default
    nms = _nms(mag, gx, gy)
    strong = nms > high_threshold
    weak = nms > low_threshold  # superset including strong
    edges = _hysteresis(strong, weak)
    return (edges * 255).astype(jnp.uint8)


# --------------------------------------------------------------------------
# numpy reference (host path + golden for the JAX version)
# --------------------------------------------------------------------------


def canny_np(
    image: np.ndarray, low_threshold: float = 100.0, high_threshold: float = 200.0
) -> np.ndarray:
    """Same algorithm in plain numpy (BFS hysteresis)."""
    img = np.asarray(image, dtype=np.float32)
    gray = (
        np.round(img @ np.asarray(_GRAY_W, dtype=np.float32))
        if img.ndim == 3
        else img
    )
    g = np.pad(gray, 1, mode="edge")
    h, w = gray.shape

    def sh(dy, dx):
        return g[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    gx = (sh(-1, 1) - sh(-1, -1)) + 2 * (sh(0, 1) - sh(0, -1)) + (sh(1, 1) - sh(1, -1))
    gy = (sh(1, -1) - sh(-1, -1)) + 2 * (sh(1, 0) - sh(-1, 0)) + (sh(1, 1) - sh(-1, 1))
    mag = np.abs(gx) + np.abs(gy)

    TAN22, TAN67 = 0.4142135623730951, 2.414213562373095
    ax, ay = np.abs(gx), np.abs(gy)
    m = np.pad(mag, 1)

    def shm(dy, dx):
        return m[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    horiz = ay <= ax * TAN22
    vert = ay > ax * TAN67
    diag_same = np.sign(gx) == np.sign(gy)
    neighbor = np.where(
        horiz,
        np.maximum(shm(0, 1), shm(0, -1)),
        np.where(
            vert,
            np.maximum(shm(1, 0), shm(-1, 0)),
            np.where(
                diag_same,
                np.maximum(shm(1, 1), shm(-1, -1)),
                np.maximum(shm(1, -1), shm(-1, 1)),
            ),
        ),
    )
    nms = np.where(mag >= neighbor, mag, 0.0)

    strong = nms > high_threshold
    weak = nms > low_threshold
    # BFS from strong pixels through weak ones.
    visited = strong.copy()
    stack = list(zip(*np.nonzero(strong)))
    while stack:
        y, x = stack.pop()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w and weak[ny, nx] and not visited[ny, nx]:
                    visited[ny, nx] = True
                    stack.append((ny, nx))
    return (visited * 255).astype(np.uint8)
