"""Flash-attention kernel correctness vs the XLA reference.

On the CPU test backend the kernel runs in Pallas interpret mode (slow but
exact semantics); on a real TPU the same tests exercise the compiled Mosaic
kernel (see bench_kernels.py for perf).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastedit_tpu.ops import flags
from fastedit_tpu.ops.attention import attention, attention_xla
from fastedit_tpu.ops import flash_attention as fa


def _qkv(b, s, h, d, dtype=jnp.float32, skv=None, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    skv = skv or s
    q = jax.random.normal(kq, (b, s, h, d), dtype)
    k = jax.random.normal(kk, (b, skv, h, d), dtype)
    v = jax.random.normal(kv, (b, skv, h, d), dtype)
    return q, k, v


def _interpret_if_cpu():
    return jax.default_backend() != "tpu"


@pytest.mark.parametrize(
    "s,h,d",
    [
        (256, 4, 64),  # UNet deep block (smallest)
        (1024, 2, 64),  # UNet mid-res block
        (512, 1, 512),  # VAE-style fat single head
    ],
)
def test_flash_matches_xla(s, h, d):
    q, k, v = _qkv(1, s, h, d)
    ref = attention_xla(q, k, v)
    with flags.override(pallas_interpret=_interpret_if_cpu()):
        out = fa.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_bf16_close_to_fp32_reference():
    q, k, v = _qkv(1, 256, 2, 64, dtype=jnp.bfloat16)
    ref = attention_xla(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    with flags.override(pallas_interpret=_interpret_if_cpu()):
        out = fa.flash_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_supports_dispatch_rules():
    assert fa.supports((1, 4096, 10, 64), 4096)  # UNet hi-res self-attn
    assert fa.supports((1, 16384, 1, 512), 16384)  # VAE mid at 1024 px
    assert not fa.supports((1, 4096, 10, 64), 77)  # cross-attn -> XLA
    assert not fa.supports((1, 64, 2, 16), 64)  # tiny smoke model -> XLA
    assert not fa.supports((1, 100, 2, 64), 100)  # indivisible seq -> XLA


def test_dispatcher_falls_back_for_cross_attention():
    q, k, v = _qkv(1, 256, 2, 64, skv=77)
    with flags.override(use_pallas_attention=True, pallas_interpret=True):
        out = attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(attention_xla(q, k, v)), rtol=1e-5, atol=1e-5
    )


def test_custom_scale():
    q, k, v = _qkv(1, 256, 2, 64)
    ref = attention_xla(q, k, v, scale=0.5)
    with flags.override(pallas_interpret=_interpret_if_cpu()):
        out = fa.flash_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
