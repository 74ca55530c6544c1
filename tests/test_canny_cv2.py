"""Bit-exactness of all three Canny implementations vs the real OpenCV.

The behavior spec is the reference's preprocess_image
(src/pipeline.py:195-210): ``cv2.cvtColor(rgb, COLOR_RGB2GRAY)`` then
``cv2.Canny(gray, low, high)``.  cv2 5.0 is installed in this image, so
parity is pinned directly — zero pixel disagreement on noise, gradients,
synthetic shapes, and flat quantized (tie-heavy) fixtures, at several
threshold pairs.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from fastedit_tpu.ops.canny import canny_jax, canny_np, rgb_to_gray  # noqa: E402


def _fixtures():
    rng = np.random.default_rng(42)
    out = []
    # pure uint8 noise (worst case for NMS tie-breaking)
    out.append(("noise", rng.integers(0, 256, (97, 123, 3), dtype=np.uint8)))
    # smooth gradients + noise
    yy, xx = np.mgrid[0:96, 0:96]
    base = (yy * 2 + xx).astype(np.uint8)
    img = np.stack([base, base.T, base // 2], -1).astype(int)
    img = np.clip(img + rng.integers(-20, 20, img.shape), 0, 255).astype(np.uint8)
    out.append(("gradient", img))
    # synthetic shapes (structured edges)
    img = np.zeros((120, 120, 3), np.uint8)
    img[20:100, 20:100] = (200, 180, 90)
    img[40:80, 40:80] = (30, 240, 120)
    img = np.clip(
        img.astype(int) + rng.integers(-10, 10, img.shape), 0, 255
    ).astype(np.uint8)
    out.append(("shapes", img))
    # flat quantized regions -> many exact magnitude ties
    out.append(
        ("flat-ties", (rng.integers(0, 4, (80, 80, 3)) * 60).astype(np.uint8))
    )
    return out


FIXTURES = _fixtures()
THRESHOLDS = [(100, 200), (50, 150), (30, 60)]


@pytest.mark.parametrize("name,img", FIXTURES, ids=[n for n, _ in FIXTURES])
def test_gray_matches_cv2(name, img):
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    ours = np.asarray(rgb_to_gray(jnp.asarray(img))).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("low,high", THRESHOLDS)
@pytest.mark.parametrize("name,img", FIXTURES, ids=[n for n, _ in FIXTURES])
def test_canny_np_matches_cv2(name, img, low, high):
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    ref = cv2.Canny(gray, low, high)
    ours = canny_np(img, low, high)
    assert (ours != ref).sum() == 0


@pytest.mark.parametrize("name,img", FIXTURES, ids=[n for n, _ in FIXTURES])
def test_canny_jax_matches_cv2(name, img):
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    ref = cv2.Canny(gray, 100, 200)
    # float input path, as used inside the fused edit program
    ours = np.asarray(canny_jax(jnp.asarray(img).astype(jnp.float32), 100.0, 200.0))
    assert (ours != ref).sum() == 0


def test_canny_jax_swapped_thresholds_match_cv2():
    _, img = FIXTURES[0]
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    ref = cv2.Canny(gray, 200, 100)  # cv2 swaps internally
    ours = np.asarray(canny_jax(jnp.asarray(img), 200.0, 100.0))
    assert (ours != ref).sum() == 0


def test_canny_native_matches_cv2():
    from fastedit_tpu.ops.canny_native import available, canny_native

    if not available():
        pytest.skip("native library not built")
    for name, img in FIXTURES:
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        ref = cv2.Canny(gray, 100, 200)
        ours = canny_native(img, 100.0, 200.0)
        assert (ours != ref).sum() == 0, name
