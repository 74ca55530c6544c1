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


@pytest.mark.parametrize("s,h", [(256, 2), (512, 4)])
def test_packed_matches_unpacked_kernel(s, h):
    """Head-packed kernel (2 heads per 128-lane tile) == the per-head path."""
    q, k, v = _qkv(2, s, h, 64, seed=7)
    assert fa.supports_packed(q.shape, s, 4)
    ref = attention_xla(q, k, v)
    with flags.override(pallas_interpret=_interpret_if_cpu()):
        out = fa.flash_attention(q, k, v)  # dispatches packed (h even, d=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # Force the unpacked kernel for the same inputs: identical results.
    bq, bkv = fa._pick_blocks(s, s, 64)
    b = q.shape[0]

    def to_bhsd(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, 64)

    with flags.override(pallas_interpret=_interpret_if_cpu()):
        out_unpacked = fa._flash_bhsd(
            to_bhsd(q), to_bhsd(k), to_bhsd(v), 64**-0.5, bq, bkv
        )
    out_unpacked = jnp.transpose(
        out_unpacked.reshape(b, h, s, 64), (0, 2, 1, 3)
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_unpacked), rtol=2e-5, atol=2e-5
    )


def test_packed_multi_kv_blocks():
    """Sequence long enough for >1 kv block: running-stat merges per head."""
    q, k, v = _qkv(1, 1024, 2, 64, seed=3)
    bq, bkv = 256, 256
    h = 2

    def pack(x):
        return jnp.transpose(x.reshape(1, 1024, 1, 128), (0, 2, 1, 3)).reshape(
            1, 1024, 128
        )

    ref = attention_xla(q, k, v)
    with flags.override(pallas_interpret=_interpret_if_cpu()):
        out = fa._flash_packed(pack(q), pack(k), pack(v), 64**-0.5, bq, bkv)
    out = jnp.transpose(out.reshape(1, 1, 1024, 128), (0, 2, 1, 3)).reshape(
        1, 1024, 2, 64
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_packed_dispatch_rules():
    assert fa.supports_packed((2, 4096, 10, 64), 4096)
    assert fa.supports_packed((2, 1024, 20, 64), 1024)
    assert not fa.supports_packed((2, 4096, 5, 64), 4096)  # odd head count
    assert not fa.supports_packed((1, 16384, 1, 512), 16384)  # fat head
    assert not fa.supports_packed((1, 4096, 10, 32), 4096)  # d != 64


def test_custom_scale():
    q, k, v = _qkv(1, 256, 2, 64)
    ref = attention_xla(q, k, v, scale=0.5)
    with flags.override(pallas_interpret=_interpret_if_cpu()):
        out = fa.flash_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
