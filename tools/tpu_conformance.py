"""Accelerator-vs-host numeric conformance check.

The CPU test suite cannot catch accelerator-only numerics (XLA:TPU lowers
nominal-f32 convs/dots to bf16 passes by default — this silently broke
SSIM on real images while every CPU golden test stayed green).  This tool
runs the numerically-sensitive programs on BOTH the default accelerator
backend and the host CPU backend in one process and compares:

  * SSIM / PSNR / MSE on a high-DC low-variance stress pair (the shape
    that exposed the bf16 cancellation) and on a structured pair
  * Canny edge maps vs the integer numpy reference (must be bit-exact —
    the path is integer fixed-point, immune to float lowering)
  * the attention and group_norm ops at pipeline shapes (tolerance-tiered:
    these are *designed* bf16 and only checked for agreement scale)

Usage:  python tools/tpu_conformance.py      (exit 0 = conformant)
Cites:  reference src/metrics.py:150-387 (metric conventions),
        src/pipeline.py:200-205 (cv2.Canny semantics).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from fastedit_tpu.metrics import functional as F
    from fastedit_tpu.ops.canny import canny_jax, canny_np

    acc = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print(f"[conformance] accelerator={acc.platform} host={cpu.platform}")
    if acc.platform == "cpu":
        print("[conformance] no accelerator present; trivially conformant")
        return 0

    failures = []

    def on(dev, fn, *args):
        placed = [jax.device_put(a, dev) for a in args]
        out = jax.jit(fn)(*placed)
        return jax.tree_util.tree_map(np.asarray, out)

    def check(name, fn, args, atol, exact=False):
        a = on(acc, fn, *args)
        c = on(cpu, fn, *args)
        if exact:
            ok = np.array_equal(a, c)
            delta = float(np.sum(a != c)) if not ok else 0.0
        else:
            delta = float(np.max(np.abs(np.asarray(a, np.float64) - c)))
            ok = delta <= atol
        status = "ok" if ok else "FAIL"
        print(f"[conformance] {name:34s} {status}  (max delta {delta:.3e},"
              f" tol {atol:.0e}{', exact' if exact else ''})")
        if not ok:
            failures.append(name)

    rng = np.random.default_rng(0)

    # --- metrics: the stress pair that exposed the bf16 lowering bug
    x = (0.8 + 0.01 * rng.standard_normal((1, 256, 256, 3))).astype(np.float32)
    y = (x + 0.005 * rng.standard_normal((1, 256, 256, 3))).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        check("ssim (high-DC stress)", F.ssim, (x, y), 1e-4)
        check("psnr", F.psnr, (x, y), 1e-3)
        check("mse", F.mse, (x, y), 1e-7)
        g = np.clip(
            np.cumsum(rng.random((1, 256, 256, 3)), axis=1) / 256.0, 0, 1
        ).astype(np.float32)
        check("ssim (structured)", F.ssim, (g, np.roll(g, 3, axis=2)), 1e-4)

    # --- canny: integer fixed-point, must be bit-exact on any backend
    img = rng.integers(0, 255, (128, 128, 3)).astype(np.float32)
    edges_acc = np.asarray(
        jax.jit(canny_jax)(jax.device_put(jnp.asarray(img), acc),
                           jnp.float32(100), jnp.float32(200))
    )
    edges_ref = canny_np(img, 100, 200)
    ok = np.array_equal(edges_acc, edges_ref)
    print(f"[conformance] {'canny vs numpy reference':34s} "
          f"{'ok' if ok else 'FAIL'}  ({np.sum(edges_acc != edges_ref)} px differ, exact)")
    if not ok:
        failures.append("canny")

    # --- designed-bf16 ops: agreement *scale* only
    from fastedit_tpu.ops import flags
    from fastedit_tpu.ops.attention import attention
    from fastedit_tpu.ops.groupnorm import group_norm_xla

    q = rng.standard_normal((1, 256, 2, 64)).astype(np.float32) * 0.1
    # Dispatch keys on the process-default backend, not arg placement —
    # pin the XLA reference path for the cross-backend comparison, then
    # separately compare accelerator-Pallas against host-XLA.
    flags.FLAGS.use_pallas_attention = False
    check("attention (xla path, f32 in)",
          lambda a, b, c: attention(a, b, c), (q, q, q), 5e-3)
    flags.FLAGS.use_pallas_attention = True
    att_pallas = on(acc, lambda a, b, c: attention(a, b, c), q, q, q)
    flags.FLAGS.use_pallas_attention = False
    att_xla = on(cpu, lambda a, b, c: attention(a, b, c), q, q, q)
    flags.FLAGS.use_pallas_attention = None
    delta = float(np.max(np.abs(np.asarray(att_pallas, np.float64) - att_xla)))
    ok = delta <= 5e-3
    print(f"[conformance] {'flash attention (pallas vs xla)':34s} "
          f"{'ok' if ok else 'FAIL'}  (max delta {delta:.3e}, tol 5e-03)")
    if not ok:
        failures.append("flash-attention")

    h = rng.standard_normal((1, 32, 32, 64)).astype(np.float32)
    sc = np.ones((64,), np.float32)
    bi = np.zeros((64,), np.float32)
    check("group_norm+silu (f32 in)",
          lambda t, s, b: group_norm_xla(t, s, b, 32, act="silu"),
          (h, sc, bi), 5e-3)

    if failures:
        print(f"[conformance] FAILED: {failures}")
        return 1
    print("[conformance] all checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
