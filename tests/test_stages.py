"""Stage-level consistency tests (prepare path, encode/decode conventions)."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp


from fastedit_tpu.ops.canny import canny_np


@pytest.fixture(scope="module")
def editor(tiny_editor_f32):
    return tiny_editor_f32


def _img(seed=0, n=64):
    r = np.random.default_rng(seed)
    return Image.fromarray(r.integers(0, 255, (n, n, 3), dtype=np.uint8), "RGB")


def test_prepare_control_matches_preprocess_image(editor):
    """The fused prepare program and the public preprocess_image API must
    produce the same Canny edges (before the tiny model's cond resize)."""
    img = _img(1)
    u8 = np.asarray(img, dtype=np.uint8)
    control, vae_in = editor._prepare(
        jnp.asarray(u8), jnp.float32(100), jnp.float32(200)
    )
    api_edges = np.asarray(editor.preprocess_image(img, 100, 200))[..., 0]
    golden = canny_np(u8.astype(np.float32), 100, 200)
    np.testing.assert_array_equal(api_edges, golden)
    # control is the (possibly resized) 3-channel edges/255 in model dtype.
    assert control.shape[0] == 1 and control.shape[-1] == 3
    assert float(jnp.max(control)) <= 1.0 and float(jnp.min(control)) >= 0.0


def test_prepare_vae_input_normalization(editor):
    u8 = np.full((64, 64, 3), 255, np.uint8)
    control, vae_in = editor._prepare(
        jnp.asarray(u8), jnp.float32(100), jnp.float32(200)
    )
    np.testing.assert_allclose(np.asarray(vae_in, np.float32), 1.0, atol=1e-2)
    u8z = np.zeros((64, 64, 3), np.uint8)
    _, vae_in0 = editor._prepare(jnp.asarray(u8z), jnp.float32(100), jnp.float32(200))
    np.testing.assert_allclose(np.asarray(vae_in0, np.float32), -1.0, atol=1e-2)


def test_prepare_batch_matches_single(editor):
    imgs = [_img(1), _img(2)]
    u8 = np.stack([np.asarray(i, dtype=np.uint8) for i in imgs])
    cb, vb = editor._prepare_batch(jnp.asarray(u8), jnp.float32(100), jnp.float32(200))
    for i in range(2):
        cs, vs = editor._prepare(
            jnp.asarray(u8[i]), jnp.float32(100), jnp.float32(200)
        )
        np.testing.assert_array_equal(np.asarray(cb[i]), np.asarray(cs[0]))
        np.testing.assert_array_equal(np.asarray(vb[i]), np.asarray(vs[0]))


def test_vae_decode_outputs_uint8(editor):
    lat_hw = 64 // 8
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, lat_hw, lat_hw, 4))
    out = editor._vae_decode(lat)
    assert out.dtype == jnp.uint8
    assert out.shape == (1, 64, 64, 3)


def test_time_ids_convention():
    from fastedit_tpu.pipeline.stages import make_sdxl_time_ids

    tids = make_sdxl_time_ids(2, 1024)
    np.testing.assert_array_equal(
        np.asarray(tids), [[1024, 1024, 0, 0, 1024, 1024]] * 2
    )
