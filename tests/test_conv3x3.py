"""Pallas 3x3 conv kernel vs lax.conv reference (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastedit_tpu.ops import flags
from fastedit_tpu.ops.conv3x3 import conv3x3, supports


def _interp():
    return jax.default_backend() != "tpu"


def _ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _case(b, hw, cin, cout, seed=0):
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (b, hw, hw, cin), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, cin, cout)) * 0.05
    return x, w


@pytest.mark.parametrize(
    "b,hw,cin,cout",
    [(1, 16, 128, 128), (2, 8, 128, 256), (1, 32, 256, 128)],
)
def test_matches_lax_conv(b, hw, cin, cout):
    x, w = _case(b, hw, cin, cout)
    ref = _ref(x, w)
    with flags.override(pallas_interpret=_interp()):
        out = conv3x3(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_fused_silu():
    x, w = _case(1, 16, 128, 128)
    ref = jax.nn.silu(_ref(x, w))
    with flags.override(pallas_interpret=_interp()):
        out = conv3x3(x, w, act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_bias():
    x, w = _case(1, 16, 128, 128)
    bias = jnp.arange(128, dtype=jnp.float32) * 0.01
    with flags.override(pallas_interpret=_interp()):
        out = conv3x3(x, w, bias=bias)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(x, w) + bias), rtol=2e-4, atol=2e-5
    )


def test_edge_pixels_zero_padded():
    """SAME padding semantics at the borders."""
    x = jnp.ones((1, 8, 8, 128), jnp.float32)
    w = jnp.ones((3, 3, 128, 128), jnp.float32) / (9 * 128)
    with flags.override(pallas_interpret=_interp()):
        out = np.asarray(conv3x3(x, w))
    np.testing.assert_allclose(out[0, 4, 4, 0], 1.0, rtol=1e-5)  # interior
    np.testing.assert_allclose(out[0, 0, 0, 0], 4 / 9, rtol=1e-5)  # corner
    np.testing.assert_allclose(out[0, 0, 4, 0], 6 / 9, rtol=1e-5)  # edge


def test_supports_rules():
    assert supports((1, 128, 128, 1280), (3, 3, 1280, 1280))
    assert supports((1, 1024, 1024, 128), (3, 3, 128, 128))
    assert supports((1, 64, 64, 96), (3, 3, 96, 128))  # cin padded to 128
    assert supports((1, 128, 128, 320), (3, 3, 320, 320))  # UNet stage 1
    assert not supports((1, 64, 64, 4), (3, 3, 4, 128))  # tiny stem -> XLA
    assert not supports((1, 64, 64, 128), (1, 1, 128, 128))  # not 3x3


def test_fp32_gate_consistent_with_dispatch():
    """The supports() VMEM gate must use the REAL dtype itemsize: with fp32
    activations (--full_precision) shapes that bf16 serves can exceed the
    tile budget, and the dispatcher must fall back to XLA instead of
    crashing at trace time (round-2 ADVICE high)."""
    from fastedit_tpu.ops.conv3x3 import _pick_tiles
    from fastedit_tpu.ops.conv import conv3x3_same

    # SDXL up-block conv at 1024px: qualifies at itemsize 2, not at 4.
    shape, wshape = (1, 32, 32, 2560), (3, 3, 2560, 1280)
    assert supports(shape, wshape, 2)
    assert _pick_tiles(32, 32, 2560, 1280, 4) is None
    assert not supports(shape, wshape, 4)

    # End-to-end: fp32 dispatch through conv3x3_same must not raise even
    # with the Pallas flag forced on (falls back to the XLA conv).
    x = jnp.ones((1, 32, 32, 2560), jnp.float32)
    w = jnp.zeros((3, 3, 2560, 1280), jnp.float32)
    with flags.override(use_pallas_conv=True, pallas_interpret=_interp()):
        out = jax.eval_shape(conv3x3_same, x, w)
    assert out.shape == (1, 32, 32, 1280)


def test_small_cout_tail():
    """cout < 128 (the VAE's conv_out 128->3): padded to one lane tile in
    the kernel, sliced after; bias included."""
    x, w = _case(1, 16, 128, 3)
    assert supports(x.shape, w.shape)
    bias = jnp.asarray(np.linspace(-1, 1, 3), jnp.float32)
    ref = _ref(x, w) + bias
    with flags.override(pallas_interpret=_interp()):
        out = conv3x3(x, w, bias=bias)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_unaligned_cin_320():
    """cin not a lane multiple (the UNet's 320-channel stage): zero-padded
    to 384 internally, exact results."""
    x, w = _case(1, 16, 320, 320)
    assert supports(x.shape, w.shape)
    ref = _ref(x, w)
    with flags.override(pallas_interpret=_interp()):
        out = conv3x3(x, w)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
