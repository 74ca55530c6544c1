"""Native C++ Canny parity with the numpy golden reference."""

import numpy as np
import pytest

from fastedit_tpu.ops.canny import canny_np
from fastedit_tpu.ops.canny_native import available, canny_native

pytestmark = pytest.mark.skipif(
    not available(), reason="native library unavailable (no g++?)"
)

RNG = np.random.default_rng(3)


def _smooth_noise(n=48):
    base = RNG.uniform(0, 255, (n, n, 3)).astype(np.float32)
    k = np.ones((5, 5)) / 25.0
    out = np.stack(
        [
            np.real(np.fft.ifft2(np.fft.fft2(base[..., c]) * np.fft.fft2(k, s=(n, n))))
            for c in range(3)
        ],
        axis=-1,
    )
    return np.clip(out, 0, 255).astype(np.uint8)


def test_native_matches_numpy_square():
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    img[16:48, 16:48] = 200
    np.testing.assert_array_equal(
        canny_native(img), canny_np(img.astype(np.float32))
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_numpy_noise(seed):
    global RNG
    RNG = np.random.default_rng(seed)
    img = _smooth_noise()
    np.testing.assert_array_equal(
        canny_native(img, 30, 90), canny_np(img.astype(np.float32), 30, 90)
    )


def test_native_grayscale_input():
    img = np.zeros((32, 32), dtype=np.uint8)
    img[:, 16:] = 120
    np.testing.assert_array_equal(canny_native(img), canny_np(img.astype(np.float32)))


def test_native_rejects_bad_channels():
    with pytest.raises(ValueError):
        canny_native(np.zeros((8, 8, 4), dtype=np.uint8))
