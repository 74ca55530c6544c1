"""End-to-end pipeline tests on the tiny model (CPU, 8 virtual devices)."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from fastedit_tpu import FastEditor


@pytest.fixture(scope="module")
def editor():
    return FastEditor("tiny", dtype=jnp.float32)


def _img(seed=0, n=64):
    r = np.random.default_rng(seed)
    return Image.fromarray(r.integers(0, 255, (n, n, 3), dtype=np.uint8), "RGB")


def test_edit_end_to_end(editor):
    out = editor.edit(_img(), "a red bicycle", seed=7)
    assert out.size == (64, 64) and out.mode == "RGB"


def test_edit_deterministic_with_seed(editor):
    a = editor.edit(_img(), "a red bicycle", seed=7)
    b = editor.edit(_img(), "a red bicycle", seed=7)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_edit_seed_changes_output(editor):
    a = editor.edit(_img(), "a red bicycle", seed=7)
    b = editor.edit(_img(), "a red bicycle", seed=8)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_prompt_changes_output(editor):
    a = editor.edit(_img(), "a red bicycle", seed=7)
    b = editor.edit(_img(), "a blue car", seed=7)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_guidance_one_skips_cfg(editor):
    out = editor.edit(_img(), "a red bicycle", seed=7, guidance_scale=1.0)
    assert out.size == (64, 64)


def test_strength_changes_schedule(editor):
    """strength truncates the executed timesteps, so outputs must differ
    (the faithfulness ordering itself only holds for trained weights)."""
    src = _img(3)
    lo = editor.edit(src, "a dog", seed=1, strength=0.5)  # 2 steps
    hi = editor.edit(src, "a dog", seed=1, strength=1.0)  # 4 steps
    assert not np.array_equal(np.asarray(lo), np.asarray(hi))
    with pytest.raises(ValueError):
        editor.edit(src, "a dog", seed=1, strength=0.0)


def test_preprocess_image_api(editor):
    edges = editor.preprocess_image(_img(), 100, 200)
    assert edges.mode == "RGB"
    arr = np.asarray(edges)
    assert set(np.unique(arr)) <= {0, 255}
    # 3 identical channels
    np.testing.assert_array_equal(arr[..., 0], arr[..., 1])


def test_edit_batch_matches_singles_with_fixed_seed(editor):
    """Batch editing with a fixed seed reproduces per-image edit() results
    (same-noise-per-image semantics)."""
    imgs = [_img(1), _img(2)]
    prompts = ["a red bicycle", "a blue car"]
    batch = editor.edit_batch(imgs, prompts, seed=5)
    singles = [editor.edit(im, p, seed=5) for im, p in zip(imgs, prompts)]
    for b, s in zip(batch, singles):
        np.testing.assert_allclose(
            np.asarray(b, dtype=np.float32),
            np.asarray(s, dtype=np.float32),
            atol=2.0,  # fp32 reduction-order differences across batch shapes
        )


def test_edit_batch_data_parallel(editor):
    """DP over the 8-device virtual mesh: same results as unsharded batch."""
    imgs = [_img(i) for i in range(8)]
    prompts = [f"object {i}" for i in range(8)]
    ref = editor.edit_batch(imgs, prompts, seed=3)
    editor.enable_data_parallel()
    try:
        out = editor.edit_batch(imgs, prompts, seed=3)
    finally:
        editor.mesh = None
        editor._rebuild_stages()
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32), np.asarray(b, dtype=np.float32), atol=2.0
        )


def test_unknown_model_rejected():
    with pytest.raises(ValueError):
        FastEditor("nope")


def test_missing_checkpoint_message():
    with pytest.raises(FileNotFoundError, match="convert_checkpoint"):
        FastEditor("ssd-1b", checkpoint_dir="/nonexistent/path")
