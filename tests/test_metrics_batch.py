"""Batched metric evaluation must reproduce per-image metric values."""

import numpy as np
import pytest
from PIL import Image

from fastedit_tpu.metrics.calculator import MetricsCalculator


@pytest.fixture(scope="module")
def calc():
    return MetricsCalculator(device="cpu", tiny=True)


def _pil(seed, n=64):
    r = np.random.default_rng(seed)
    return Image.fromarray(r.integers(0, 255, (n, n, 3), dtype=np.uint8), "RGB")


def test_batch_matches_single(calc):
    sources = [_pil(1), _pil(2), _pil(3)]
    editeds = [_pil(4), _pil(5), _pil(6)]
    prompts = ["a cat", "a dog", "a car"]
    batch = calc.calculate_all_metrics_batch(sources, editeds, prompts)
    for i in range(3):
        single = calc.calculate_all_metrics(sources[i], editeds[i], prompts[i])
        for k in single:
            np.testing.assert_allclose(
                batch[i][k], single[k], rtol=2e-4, atol=2e-5, err_msg=f"{k}[{i}]"
            )


def test_batch_size_one(calc):
    out = calc.calculate_all_metrics_batch([_pil(7)], [_pil(8)], ["x"])
    assert len(out) == 1 and set(out[0]) == {
        "ssim", "lpips", "clip_score", "psnr", "mse", "dino_distance",
    }
