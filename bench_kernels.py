"""Kernel micro-benchmarks: Pallas vs XLA on the real TPU chip.

Timing methodology for this environment (see .claude/skills/verify): the
axon relay acks block_until_ready early and adds ~25 ms per dispatch, so
each measurement loops the op N times inside one jit and syncs via a scalar
readback.

Usage: python bench_kernels.py [attention|groupnorm|all]
"""

import sys
import time

import jax
import jax.numpy as jnp


def _time(fn, *args, inner=10, outer=5):
    def many(*a):
        x = a[0]
        for _ in range(inner):
            x = fn(x, *a[1:])
        return jnp.sum(x.astype(jnp.float32))

    f = jax.jit(many)
    float(f(*args))  # compile
    t0 = time.time()
    for _ in range(outer):
        float(f(*args))
    return (time.time() - t0) / outer / inner


def bench_attention():
    from fastedit_tpu.ops.attention import attention_xla
    from fastedit_tpu.ops import flash_attention as fa

    key = jax.random.PRNGKey(0)
    print("attention (bf16):")
    for s, h, d in [(4096, 10, 64), (1024, 20, 64), (256, 20, 64), (16384, 1, 512)]:
        q, k, v = (
            jax.random.normal(kk, (2, s, h, d), jnp.bfloat16)
            for kk in jax.random.split(key, 3)
        )
        flops = 4 * 2 * h * s * s * d

        def pallas_qfix(q):
            return fa.flash_attention(q, k, v)

        def xla_qfix(q):
            return attention_xla(q, k, v)

        tp = _time(pallas_qfix, q)
        tx = _time(xla_qfix, q)
        print(
            f"  S={s:5d} H={h:2d} D={d:3d}: pallas {tp*1e3:7.3f} ms"
            f" ({flops/tp/1e12:5.1f} TF/s) | xla {tx*1e3:7.3f} ms"
            f" ({flops/tx/1e12:5.1f} TF/s) | speedup {tx/tp:4.2f}x"
        )


def bench_groupnorm():
    from fastedit_tpu.ops.fused_groupnorm import fused_group_norm
    from fastedit_tpu.ops.groupnorm import group_norm_xla

    key = jax.random.PRNGKey(0)
    print("groupnorm+silu (bf16):")
    for b, h, w, c in [(2, 128, 128, 320), (2, 64, 64, 640), (1, 512, 512, 256),
                       (1, 1024, 1024, 128)]:
        x = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        gbytes = 3 * x.size * 2 / 1e9

        def pallas_fix(x):
            return fused_group_norm(x, gamma, beta, 32, act="silu")

        def xla_fix(x):
            return group_norm_xla(x, gamma, beta, 32, act="silu")

        tp = _time(pallas_fix, x)
        tx = _time(xla_fix, x)
        print(
            f"  {b}x{h}x{w}x{c}: pallas {tp*1e3:7.3f} ms ({gbytes/tp:6.1f} GB/s)"
            f" | xla {tx*1e3:7.3f} ms ({gbytes/tx:6.1f} GB/s)"
            f" | speedup {tx/tp:4.2f}x"
        )


def bench_conv():
    from fastedit_tpu.ops.conv3x3 import conv3x3

    key = jax.random.PRNGKey(0)

    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    print("conv3x3 (bf16):")
    for hw, c in [(1024, 128), (512, 256), (256, 512), (128, 1280)]:
        x = jax.random.normal(key, (1, hw, hw, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.02
        fl = 2 * hw * hw * c * c * 9
        tp = _time(lambda x: conv3x3(x, w), x)
        tx = _time(lambda x: xla_conv(x, w), x)
        print(
            f"  {hw}^2 c={c}: pallas {tp*1e3:7.3f} ms ({fl/tp/1e12:5.1f} TF/s)"
            f" | xla {tx*1e3:7.3f} ms ({fl/tx/1e12:5.1f} TF/s)"
            f" | speedup {tx/tp:4.2f}x"
        )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend())
    if which in ("attention", "all"):
        bench_attention()
    if which in ("groupnorm", "all"):
        bench_groupnorm()
    if which in ("conv", "all"):
        bench_conv()
