"""Fused resnet conv + upsample conv kernels vs unfused XLA references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastedit_tpu.ops import flags
from fastedit_tpu.ops.conv_fused import (
    conv3x3_fused,
    conv3x3_up2,
    make_phase_kernels,
    supports_fused,
    supports_up2,
)
from fastedit_tpu.ops.groupnorm import group_norm_scale_shift, group_norm_xla


def _interp():
    return jax.default_backend() != "tpu"


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _case(b, hw, cin, cout, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (b, hw, hw, cin), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, cin, cout)) * 0.05
    bias = jax.random.normal(ks[2], (cout,)) * 0.1
    gamma = 1.0 + 0.1 * jax.random.normal(ks[3], (cin,))
    beta = 0.1 * jax.random.normal(ks[4], (cin,))
    return x, w, bias, gamma, beta


def test_scale_shift_matches_group_norm():
    x, _, _, gamma, beta = _case(2, 8, 128, 128)
    s, t = group_norm_scale_shift(x, gamma, beta, num_groups=32)
    ref = group_norm_xla(x, gamma, beta, num_groups=32)
    out = x * s[:, None, None, :] + t[:, None, None, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_plain_equivalent_to_conv3x3():
    """With no prologue/skip the fused kernel is the plain conv."""
    x, w, bias, _, _ = _case(1, 16, 128, 128)
    ref = _ref_conv(x, w) + bias
    with flags.override(pallas_interpret=_interp()):
        out = conv3x3_fused(x, w, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_prenorm_prologue():
    """GN+SiLU folded into the kernel == normalize-then-conv, including the
    SAME-padding ring staying zero after normalization."""
    x, w, bias, gamma, beta = _case(2, 16, 128, 128)
    a = group_norm_xla(x, gamma, beta, num_groups=32, act="silu")
    ref = _ref_conv(a, w) + bias
    s, t = group_norm_scale_shift(x, gamma, beta, num_groups=32)
    with flags.override(pallas_interpret=_interp()):
        out = conv3x3_fused(x, w, bias=bias, prenorm=(s, t))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_per_batch_bias_and_skip():
    """Per-batch bias (time-embedding fold) + residual skip epilogue."""
    x, w, bias, _, _ = _case(2, 16, 128, 128)
    temb = jax.random.normal(jax.random.PRNGKey(9), (2, 128)) * 0.2
    skip = jax.random.normal(jax.random.PRNGKey(10), x.shape)
    bias_b = bias[None, :] + temb  # [B, Cout]
    ref = _ref_conv(x, w) + bias_b[:, None, None, :] + skip
    with flags.override(pallas_interpret=_interp()):
        out = conv3x3_fused(x, w, bias=bias_b, skip=skip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_full_resnet_block_fusion():
    """Both fused convs chained = the whole unfused resnet block body."""
    b, hw, c = 2, 16, 128
    x, w1, b1, g1, be1 = _case(b, hw, c, c, seed=3)
    _, w2, b2, g2, be2 = _case(b, hw, c, c, seed=4)
    temb = jax.random.normal(jax.random.PRNGKey(5), (b, c)) * 0.3

    # unfused reference
    h1 = group_norm_xla(x, g1, be1, num_groups=32, act="silu")
    h1 = _ref_conv(h1, w1) + b1 + temb[:, None, None, :]
    h2 = group_norm_xla(h1, g2, be2, num_groups=32, act="silu")
    ref = _ref_conv(h2, w2) + b2 + x

    s1, t1 = group_norm_scale_shift(x, g1, be1, num_groups=32)
    with flags.override(pallas_interpret=_interp()):
        mid = conv3x3_fused(x, w1, bias=b1[None, :] + temb, prenorm=(s1, t1))
        s2, t2 = group_norm_scale_shift(mid, g2, be2, num_groups=32)
        out = conv3x3_fused(mid, w2, bias=b2, prenorm=(s2, t2), skip=x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-5)


def test_unaligned_channels_prenorm():
    """cin=96 zero-padded to 128: padded channels get scale=shift=0 so the
    prologue keeps them zero and taps are exact."""
    x, w, bias, gamma, beta = _case(1, 8, 96, 128)
    a = group_norm_xla(x, gamma, beta, num_groups=32, act="silu")
    ref = _ref_conv(a, w) + bias
    s, t = group_norm_scale_shift(x, gamma, beta, num_groups=32)
    with flags.override(pallas_interpret=_interp()):
        out = conv3x3_fused(x, w, bias=bias, prenorm=(s, t))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


# ----------------------------------------------------------------- upsample


def _ref_up2(x, w, bias=None, act=None):
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    out = _ref_conv(up, w)
    if bias is not None:
        out = out + bias
    if act == "silu":
        out = jax.nn.silu(out)
    return out


def test_phase_kernels_identity():
    """Phase decomposition == conv on the materialized 2x upsample (dense
    einsum check, no Pallas)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 6, 6, 8))
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 8, 8)) * 0.1
    ref = _ref_up2(x, w)
    k4 = make_phase_kernels(w)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros_like(ref)
    for p in range(2):
        for q in range(2):
            acc = 0
            for a in range(2):
                for bb in range(2):
                    acc = acc + jnp.einsum(
                        "bhwi,io->bhwo",
                        xp[:, p + a : p + a + 6, q + bb : q + bb + 6, :],
                        k4[p, q, a, bb],
                    )
            out = out.at[:, p::2, q::2, :].set(acc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("b,hw,cin,cout", [(1, 8, 128, 128), (2, 16, 128, 256)])
def test_up2_matches_materialized(b, hw, cin, cout):
    x, w, bias, _, _ = _case(b, hw, cin, cout)
    ref = _ref_up2(x, w, bias)
    with flags.override(pallas_interpret=_interp()):
        out = conv3x3_up2(x, w, bias=bias)
    assert out.shape == (b, 2 * hw, 2 * hw, cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_up2_silu_and_small_cout():
    x, w, bias, _, _ = _case(1, 8, 128, 3)
    ref = _ref_up2(x, w, bias, act="silu")
    with flags.override(pallas_interpret=_interp()):
        out = conv3x3_up2(x, w, bias=bias, act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_resnet_block_module_fused_equals_unfused():
    """ResnetBlock2D with use_fused_resnet on == the unfused module path,
    same params (checkpoint compatibility) — covers prenorm folding, the
    time-embedding per-batch bias, and the residual epilogue end-to-end."""
    from fastedit_tpu.models.resnet import ResnetBlock2D

    block = ResnetBlock2D(out_channels=128, groups=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 128))
    temb = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    params = block.init(jax.random.PRNGKey(2), x, temb)
    with flags.override(use_fused_resnet=False):
        ref = block.apply(params, x, temb)
    with flags.override(use_fused_resnet=True, pallas_interpret=_interp()):
        out = block.apply(params, x, temb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-5)


def test_resnet_block_module_fused_shortcut_no_temb():
    """Channel-changing block without time embedding (VAE decoder case):
    conv_shortcut feeds the fused skip epilogue."""
    from fastedit_tpu.models.resnet import ResnetBlock2D

    block = ResnetBlock2D(out_channels=128, use_time_emb=False, groups=32)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 256))
    params = block.init(jax.random.PRNGKey(4), x)
    with flags.override(use_fused_resnet=False):
        ref = block.apply(params, x)
    with flags.override(use_fused_resnet=True, pallas_interpret=_interp()):
        out = block.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-5)


def test_upsample_module_fused_equals_unfused():
    from fastedit_tpu.models.resnet import Upsample2D

    up = Upsample2D(out_channels=128)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 128))
    params = up.init(jax.random.PRNGKey(6), x)
    with flags.override(use_fused_up2=False):
        ref = up.apply(params, x)
    with flags.override(use_fused_up2=True, pallas_interpret=_interp()):
        out = up.apply(params, x)
    assert out.shape == ref.shape == (1, 16, 16, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_supports_gates():
    assert supports_fused((1, 128, 128, 1280), (3, 3, 1280, 1280), 2)
    assert supports_fused((1, 128, 128, 1280), (3, 3, 1280, 1280), 2, True)
    assert not supports_fused((1, 64, 64, 4), (3, 3, 4, 128), 2)
    assert supports_up2((1, 512, 512, 256), (3, 3, 256, 256), 2)
    assert supports_up2((1, 128, 128, 512), (3, 3, 512, 512), 2)
    assert not supports_up2((1, 64, 64, 4), (3, 3, 4, 128), 2)


# --------------------------------------------------------------------------
# conv3x3_down2 (stride-2 phase-decomposed downsample conv)
# --------------------------------------------------------------------------


def _ref_down2(x, w, bias, asymmetric):
    if asymmetric:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        pad = [(0, 0), (0, 0)]
    else:
        pad = [(1, 1), (1, 1)]
    out = jax.lax.conv_general_dilated(
        x, w, (2, 2), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out if bias is None else out + bias


@pytest.mark.parametrize("asymmetric", [False, True])
def test_down2_matches_strided_conv(asymmetric):
    from fastedit_tpu.ops.conv_fused import conv3x3_down2, supports_down2

    x, w, bias, _, _ = _case(2, 16, 128, 128)
    assert supports_down2(x.shape, w.shape, x.dtype.itemsize)
    ref = _ref_down2(x, w, bias, asymmetric)
    with flags.override(pallas_interpret=_interp()):
        out = conv3x3_down2(x, w, bias=bias, asymmetric=asymmetric)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_down2_unaligned_channels_and_act():
    """Zero-padded unaligned channels (96 -> 320) + fused SiLU."""
    from fastedit_tpu.ops.conv_fused import conv3x3_down2, supports_down2

    x, w, bias, _, _ = _case(1, 8, 96, 320, seed=3)
    assert supports_down2(x.shape, w.shape, x.dtype.itemsize)
    ref = _ref_down2(x, w, bias, False)
    ref = ref * jax.nn.sigmoid(ref)
    with flags.override(pallas_interpret=_interp()):
        out = conv3x3_down2(x, w, bias=bias, act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_down2_vae_encoder_shape_bf16():
    """The 1024^2 VAE-encoder downsample shape class (scaled to 64^2 for CPU
    interpret mode), bf16 in/out like production."""
    from fastedit_tpu.ops.conv_fused import conv3x3_down2, supports_down2

    x, w, bias, _, _ = _case(1, 64, 128, 128, seed=5)
    xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
    assert supports_down2(xb.shape, wb.shape, xb.dtype.itemsize)
    ref = _ref_down2(xb, wb, bias.astype(jnp.bfloat16), True)
    with flags.override(pallas_interpret=_interp()):
        out = conv3x3_down2(xb, wb, bias=bias.astype(jnp.bfloat16), asymmetric=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(ref, dtype=np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_down2_support_gates():
    from fastedit_tpu.ops.conv_fused import supports_down2

    assert not supports_down2((1, 15, 16, 128), (3, 3, 128, 128), 2)  # odd h
    assert not supports_down2((1, 16, 16, 32), (3, 3, 32, 128), 2)  # cin < 64
    assert not supports_down2((1, 16, 16, 128), (1, 1, 128, 128), 2)  # not 3x3
    assert not supports_down2((16, 16, 128), (3, 3, 128, 128), 2)  # rank
