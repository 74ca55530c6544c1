"""Canny parity tests: JAX implementation vs numpy reference (SURVEY.md §7
hard part #5 — cv2 itself is unavailable here; the numpy reference encodes
the cv2 algorithm and the JAX version must match it exactly)."""

import jax.numpy as jnp
import numpy as np

from fastedit_tpu.ops.canny import canny_jax, canny_np, rgb_to_gray

RNG = np.random.default_rng(7)


def _square_image(n=64):
    img = np.zeros((n, n, 3), dtype=np.float32)
    img[16:48, 16:48] = 200.0
    return img


def test_gray_weights():
    img = np.zeros((2, 2, 3), dtype=np.float32)
    img[..., 0] = 100  # pure red
    g = np.asarray(rgb_to_gray(jnp.asarray(img)))
    np.testing.assert_allclose(g, np.round(100 * 0.299))


def test_square_edges_detected():
    edges = canny_np(_square_image())
    assert edges.dtype == np.uint8
    assert set(np.unique(edges)) <= {0, 255}
    # The square boundary must be marked, interior and far exterior clean.
    assert edges[16, 30] == 255 or edges[15, 30] == 255
    assert edges[32, 32] == 0
    assert edges[2, 2] == 0


def test_jax_matches_numpy_on_square():
    img = _square_image()
    np.testing.assert_array_equal(
        np.asarray(canny_jax(jnp.asarray(img))), canny_np(img)
    )


def test_jax_matches_numpy_on_noise():
    """Random smooth-ish image: identical NMS + hysteresis decisions."""
    base = RNG.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    # Smooth with a box filter to create structured gradients.
    k = np.ones((5, 5)) / 25.0
    sm = np.stack(
        [
            np.real(
                np.fft.ifft2(
                    np.fft.fft2(base[..., c]) * np.fft.fft2(k, s=(32, 32))
                )
            )
            for c in range(3)
        ],
        axis=-1,
    ).astype(np.float32)
    ours = np.asarray(canny_jax(jnp.asarray(sm), 30, 90))
    ref = canny_np(sm, 30, 90)
    np.testing.assert_array_equal(ours, ref)


def test_hysteresis_links_weak_to_strong():
    """A gradient ramp: weak edge pixels connected to a strong pixel survive;
    isolated weak pixels don't."""
    img = np.zeros((20, 40), dtype=np.float32)
    img[:, 20:] = 90.0  # step of 90 -> L1 sobel magnitude 360 in the middle
    edges_high = canny_np(img, 100, 500)  # strong nowhere -> no edges
    assert edges_high.sum() == 0
    edges = canny_np(img, 100, 300)
    assert edges[:, 19:21].any()


def test_thresholds_monotone():
    img = _square_image()
    lo = canny_np(img, 50, 100)
    hi = canny_np(img, 200, 400)
    assert lo.sum() >= hi.sum()
