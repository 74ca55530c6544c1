"""Fused GroupNorm Pallas kernel vs the XLA reference (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastedit_tpu.ops import flags
from fastedit_tpu.ops.fused_groupnorm import fused_group_norm, supports
from fastedit_tpu.ops.groupnorm import group_norm_xla

RNG = np.random.default_rng(11)


def _case(b, h, w, c):
    x = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
    gamma = jnp.asarray(RNG.standard_normal(c).astype(np.float32))
    beta = jnp.asarray(RNG.standard_normal(c).astype(np.float32))
    return x, gamma, beta


def _interp():
    return jax.default_backend() != "tpu"


@pytest.mark.parametrize("shape,groups", [((2, 16, 16, 64), 32), ((1, 32, 8, 128), 32)])
def test_matches_xla(shape, groups):
    x, g, b = _case(*shape)
    ref = group_norm_xla(x, g, b, groups)
    with flags.override(pallas_interpret=_interp()):
        out = fused_group_norm(x, g, b, groups)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_matches_xla_with_silu():
    x, g, b = _case(1, 16, 16, 64)
    ref = group_norm_xla(x, g, b, 16, act="silu")
    with flags.override(pallas_interpret=_interp()):
        out = fused_group_norm(x, g, b, 16, act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_multi_tile_reduction():
    """H larger than one tile: stats must accumulate across tiles."""
    x, g, b = _case(1, 64, 4, 128)
    ref = group_norm_xla(x, g, b, 32)
    with flags.override(pallas_interpret=_interp()):
        out = fused_group_norm(x, g, b, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_supports_dispatch():
    assert supports((1, 128, 128, 320), 32)  # UNet stem at 1024px
    assert supports((1, 1024, 1024, 128), 32)  # VAE top block
    assert not supports((1, 16, 16, 30), 32)  # channels not divisible


def test_large_mean_no_cancellation():
    """|mean| >> std: the one-pass E[x^2]-E[x]^2 variance form loses most
    significant bits in f32 (the exact failure ops/groupnorm.py's XLA path
    documents); the kernel's two-pass (centered) accumulation must stay
    accurate."""
    rng = np.random.default_rng(7)
    x = (2000.0 + 0.1 * rng.standard_normal((1, 16, 8, 64))).astype(np.float32)
    g = np.ones(64, np.float32)
    b = np.zeros(64, np.float32)
    ref = group_norm_xla(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), 16)
    with flags.override(pallas_interpret=_interp()):
        out = fused_group_norm(
            jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), 16
        )
    # The cancellation failure mode is a wrong SCALE: var = E[x^2]-mean^2
    # at |x|~2000 loses ~all bits (ulp(4e6)=0.5 vs true var 0.01), so the
    # normalized output's per-group std lands far from 1 (often 30x off
    # when var underflows to eps).  Mean-accumulation rounding, by
    # contrast, is a tiny constant shift (~1e-2 here) inherent to f32 sums
    # at this magnitude — present in the XLA path too, and harmless.
    for arr in (np.asarray(out), np.asarray(ref)):
        stds = arr.reshape(1, 16 * 8, 16, 4).std(axis=(1, 3))
        np.testing.assert_allclose(stds, 1.0, rtol=0.01)
    # kernel-vs-XLA agreement up to their differing f32 summation orders
    # (per-group mean shifts of ~2e-2 at |x|~2000; scale is what matters)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=5e-2
    )
