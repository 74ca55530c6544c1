"""Conv micro-benchmarks on the real chip: XLA conv vs Pallas variants.

Covers the conv shapes that dominate the edit path (SSD-1B UNet stages at
128x128 latents with the CFG batch of 2, and the VAE decoder pyramid at
batch 1), plus the GroupNorm+SiLU+conv resnet chain to measure how
HBM-bound the decoder is.

Timing follows bench_kernels.py methodology: the axon relay acks
block_until_ready early, so loop the op inside one jit and sync via a
scalar readback.

Usage: python bench_conv.py [conv|chain|attn|all]
"""

import sys
import time

import jax
import jax.numpy as jnp


def _time(fn, *args, inner=48, outer=3):
    # inner must be large: the axon relay adds ~25 ms per *sync*, so the
    # apparent per-op floor is ~25ms/inner (inner=8 showed a 3.2 ms floor
    # on every row of the first run of this bench).  fori_loop keeps the
    # compile O(1) in inner (48 unrolled conv chains blow the compile
    # budget); iterations are data-dependent either way.
    def many(*a):
        x = jax.lax.fori_loop(0, inner, lambda i, x: fn(x, *a[1:]), a[0])
        return jnp.sum(x.astype(jnp.float32))

    f = jax.jit(many)
    float(f(*args))  # compile
    t0 = time.time()
    for _ in range(outer):
        float(f(*args))
    return (time.time() - t0) / outer / inner


# (B, H, W, Cin, Cout) — same-channel 3x3s keep the loop-in-jit feedback legal
SHAPES = [
    (2, 128, 128, 320, 320),   # UNet stage 1 (CFG batch)
    (2, 64, 64, 640, 640),     # UNet stage 2
    (2, 32, 32, 1280, 1280),   # UNet stage 3
    (1, 128, 128, 512, 512),   # VAE decoder entry / mid
    (1, 256, 256, 512, 512),   # VAE decoder up1
    (1, 512, 512, 256, 256),   # VAE decoder up2
    (1, 1024, 1024, 128, 128), # VAE decoder up3 / encoder entry
]


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def bench_conv():
    from fastedit_tpu.ops import conv3x3 as pc

    key = jax.random.PRNGKey(0)
    print("3x3 SAME conv (bf16, fp32 accum):")
    for b, h, w_, cin, cout in SHAPES:
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (b, h, w_, cin), jnp.bfloat16)
        w = jax.random.normal(kw, (3, 3, cin, cout), jnp.bfloat16) * 0.05
        flops = 2 * b * h * w_ * 9 * cin * cout
        tx = _time(conv_xla, x, w)
        line = (
            f"  {b}x{h:4d}x{w_:4d}x{cin:4d}->{cout:4d}:"
            f" xla {tx*1e3:7.3f} ms ({flops/tx/1e12:5.1f} TF/s)"
        )
        if pc.supports(x.shape, w.shape, x.dtype.itemsize):
            tp = _time(lambda xx: pc.conv3x3(xx, w), x)
            line += f" | pallas {tp*1e3:7.3f} ms ({flops/tp/1e12:5.1f} TF/s) | {tx/tp:4.2f}x"
        print(line, flush=True)


def bench_chain():
    """GroupNorm(32) + SiLU + conv3x3 chain — the resnet inner pattern."""
    key = jax.random.PRNGKey(1)
    print("GN(32)+SiLU+conv3x3 chain (XLA, bf16):")
    for b, h, w_, cin, cout in SHAPES:
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (b, h, w_, cin), jnp.bfloat16)
        w = jax.random.normal(kw, (3, 3, cin, cout), jnp.bfloat16) * 0.05
        scale = jnp.ones((cin,), jnp.bfloat16)
        bias = jnp.zeros((cin,), jnp.bfloat16)
        conv_flops = 2 * b * h * w_ * 9 * cin * cout
        # HBM floor if GN+SiLU fully fused into the conv read:
        bytes_min = (b * h * w_ * (cin + cout)) * 2

        def chain_old(xx):
            f = xx.astype(jnp.float32).reshape(b, h * w_, 32, cin // 32)
            mean = f.mean(axis=(1, 3), keepdims=True)
            var = f.var(axis=(1, 3), keepdims=True)
            n = ((f - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(b, h, w_, cin)
            n = n * scale.astype(jnp.float32) + bias.astype(jnp.float32)
            n = (n * jax.nn.sigmoid(n)).astype(xx.dtype)
            return conv_xla(n, w)

        def chain_new(xx):
            from fastedit_tpu.ops.groupnorm import group_norm_xla

            return conv_xla(group_norm_xla(xx, scale, bias, 32, act="silu"), w)

        t = _time(chain_old, x)
        tn = _time(chain_new, x)
        tc = _time(conv_xla, x, w)
        print(
            f"  {b}x{h:4d}x{w_:4d}x{cin:4d}->{cout:4d}:"
            f" old {t*1e3:7.3f} ms | new {tn*1e3:7.3f} ms ({t/tn:4.2f}x)"
            f" | conv alone {tc*1e3:7.3f} ms"
            f" | gn adds old {(t-tc)*1e3:6.3f} new {(tn-tc)*1e3:6.3f} ms"
            f" | hbm floor {bytes_min/819e9*1e3:6.3f} ms @800GB/s",
            flush=True,
        )


def bench_gn():
    """GroupNorm(32)+SiLU: old reshape-formulation vs ops.group_norm_xla."""
    from fastedit_tpu.ops.groupnorm import group_norm_xla

    def gn_old(x, gamma, beta, eps=1e-5):
        b, h, w_, c = x.shape
        xf = x.astype(jnp.float32).reshape(b, h, w_, 32, c // 32)
        mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
        xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w_, c)
        out = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        out = out * jax.nn.sigmoid(out)
        return out.astype(x.dtype)

    key = jax.random.PRNGKey(2)
    print("GroupNorm(32)+SiLU (bf16):")
    for b, h, w_, cin, _ in SHAPES:
        x = jax.random.normal(key, (b, h, w_, cin), jnp.bfloat16)
        gamma = jnp.ones((cin,), jnp.float32)
        beta = jnp.zeros((cin,), jnp.float32)
        floor = 4 * b * h * w_ * cin * 2 / 819e9  # 3R+1W bf16 @800GB/s
        t_old = _time(lambda xx: gn_old(xx, gamma, beta), x)
        t_new = _time(
            lambda xx: group_norm_xla(xx, gamma, beta, 32, act="silu"), x
        )
        print(
            f"  {b}x{h:4d}x{w_:4d}x{cin:4d}: old {t_old*1e3:7.3f} ms"
            f" | new {t_new*1e3:7.3f} ms | {t_old/t_new:4.2f}x"
            f" | 4-pass floor {floor*1e3:6.3f} ms",
            flush=True,
        )


def bench_fused():
    """Whole resnet block: unfused XLA vs unfused Pallas-conv vs fused kernels."""
    from fastedit_tpu.models.resnet import ResnetBlock2D
    from fastedit_tpu.ops import flags

    key = jax.random.PRNGKey(3)
    print("resnet block (GN+SiLU+conv+temb+GN+SiLU+conv+skip), bf16:")
    for b, h, w_, cin, cout in SHAPES:
        block = ResnetBlock2D(
            out_channels=cout, groups=32, dtype=jnp.bfloat16,
            use_time_emb=True,
        )
        x = jax.random.normal(key, (b, h, w_, cin), jnp.bfloat16)
        temb = jax.random.normal(key, (b, 1280), jnp.bfloat16)
        params = block.init(jax.random.PRNGKey(0), x, temb)
        conv_flops = 2 * b * h * w_ * 9 * (cin * cout + cout * cout)

        def run(xx, use_fused, use_pallas):
            with flags.override(
                use_fused_resnet=use_fused, use_pallas_conv=use_pallas
            ):
                return block.apply(params, xx, temb)

        t_xla = _time(lambda xx: run(xx, False, False), x)
        t_pal = _time(lambda xx: run(xx, False, True), x)
        t_fus = _time(lambda xx: run(xx, True, True), x)
        print(
            f"  {b}x{h:4d}x{w_:4d}x{cin:4d}->{cout:4d}:"
            f" xla {t_xla*1e3:7.3f} | pallas-unfused {t_pal*1e3:7.3f}"
            f" | fused {t_fus*1e3:7.3f} ms ({conv_flops/t_fus/1e12:5.1f} TF/s)"
            f" | fused vs best-old {min(t_xla, t_pal)/t_fus:4.2f}x",
            flush=True,
        )


def bench_up2():
    """Upsample2D: materialized repeat+conv (XLA / Pallas) vs phase kernel."""
    from fastedit_tpu.ops import conv3x3 as pc
    from fastedit_tpu.ops.conv_fused import conv3x3_up2, supports_up2

    key = jax.random.PRNGKey(4)
    print("nearest-2x upsample + conv3x3 (bf16):")
    for b, h, w_, cin, cout in [
        (1, 128, 128, 512, 512),  # VAE decoder up1
        (1, 256, 256, 512, 512),  # up2
        (1, 512, 512, 256, 256),  # up3
        (2, 32, 32, 1280, 1280),  # UNet up-path
        (2, 64, 64, 640, 640),
    ]:
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (b, h, w_, cin), jnp.bfloat16)
        w = jax.random.normal(kw, (3, 3, cin, cout), jnp.bfloat16) * 0.05
        flops_mat = 2 * b * (2 * h) * (2 * w_) * 9 * cin * cout

        # every variant ends with a stride-2 slice so the fori-loop carry
        # keeps its shape; the slice cost is common to all three.
        def down(y):
            return y[:, ::2, ::2, :cin]

        def up_xla(xx):
            up = jnp.repeat(jnp.repeat(xx, 2, axis=1), 2, axis=2)
            return down(conv_xla(up, w))

        def up_pallas(xx):
            up = jnp.repeat(jnp.repeat(xx, 2, axis=1), 2, axis=2)
            return down(pc.conv3x3(up, w))

        line = f"  {b}x{h:4d}x{w_:4d}x{cin:4d}->{cout:4d}:"
        tx = _time(up_xla, x)
        line += f" xla {tx*1e3:7.3f}"
        up_shape = (b, 2 * h, 2 * w_, cin)
        if pc.supports(up_shape, w.shape, 2):
            tp = _time(up_pallas, x)
            line += f" | pallas-mat {tp*1e3:7.3f}"
        if supports_up2(x.shape, w.shape, 2):
            tf = _time(lambda xx: down(conv3x3_up2(xx, w)), x)
            line += (
                f" | up2-fused {tf*1e3:7.3f} ms"
                f" ({flops_mat*16/36/tf/1e12:5.1f} TF/s)"
                f" | vs xla {tx/tf:4.2f}x"
            )
        print(line, flush=True)


def bench_attn():
    """Ours vs jax.experimental.pallas.ops.tpu.flash_attention vs XLA."""
    from fastedit_tpu.ops.attention import attention_xla
    from fastedit_tpu.ops import flash_attention as fa
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jax_fa, BlockSizes,
    )

    key = jax.random.PRNGKey(0)
    print("attention (bf16) [B,S,H,D]:")
    for s, h, d in [(4096, 10, 64), (1024, 20, 64), (256, 20, 64), (16384, 1, 512)]:
        q, k, v = (
            jax.random.normal(kk, (2, s, h, d), jnp.bfloat16)
            for kk in jax.random.split(key, 3)
        )
        flops = 2 * 4 * h * s * s * d  # 2 matmuls fwd, x2 batch

        def ours(q):
            return fa.flash_attention(q, k, v)  # packed when d=64, h even

        def ours_unpacked(q):
            blocks = fa._pick_blocks(s, s, d)
            b = q.shape[0]

            def to_bhsd(x):
                return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)

            out = fa._flash_bhsd(
                to_bhsd(q), to_bhsd(k), to_bhsd(v), d**-0.5, *blocks
            )
            return jnp.transpose(out.reshape(b, h, s, d), (0, 2, 1, 3))

        def xla(q):
            return attention_xla(q, k, v)

        def jaxfa(q):
            # jax kernel wants [B, H, S, D]
            qt, kt, vt = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
            o = jax_fa(qt, kt, vt, sm_scale=d ** -0.5)
            return jnp.swapaxes(o, 1, 2)

        to = _time(ours, q)
        tx = _time(xla, q)
        line = (
            f"  S={s:5d} H={h:2d} D={d:3d}:"
            f" ours {to*1e3:7.3f} ms ({flops/to/1e12:5.1f} TF/s)"
            f" | xla {tx*1e3:7.3f} ms ({flops/tx/1e12:5.1f} TF/s)"
        )
        if fa.supports_packed(q.shape, s, q.dtype.itemsize):
            tu = _time(ours_unpacked, q)
            line += f" | unpacked {tu*1e3:7.3f} ms ({flops/tu/1e12:5.1f} TF/s)"
        try:
            tj = _time(jaxfa, q)
            line += f" | jax-fa {tj*1e3:7.3f} ms ({flops/tj/1e12:5.1f} TF/s)"
        except Exception as e:
            line += f" | jax-fa FAILED {type(e).__name__}: {str(e)[:60]}"
        print(line, flush=True)


def bench_decode():
    """In-context VAE decode A/B: XLA decoder vs full-Pallas decoder.

    The round-2 layout-war bisect measured XLA 129 ms vs Pallas 143 ms
    (the materialized nearest-2x upsamples + boundary relayouts ate the
    per-conv wins).  conv3x3_up2 removes the materialized upsample and
    conv3x3_fused folds GN+SiLU+skip into the convs; this re-measures the
    whole decode under each flag setting.  Queue-10-sync-1 timing: decode
    calls are independent, so dispatch async and sync once (single ~25 ms
    relay ack amortized).
    """
    import numpy as np
    from fastedit_tpu import FastEditor
    from fastedit_tpu.ops import flags

    editor = FastEditor("ssd-1b", random_weights=True)
    lat = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 128, 128, 4)),
        editor.dtype,
    )

    def run(label):
        editor._rebuild_stages()
        # Relay-safe sync: block_until_ready acks early through the axon
        # relay — force a scalar readback of every output instead.
        float(jnp.sum(editor._vae_decode(lat).astype(jnp.float32)))  # compile
        n = 10
        t0 = time.time()
        outs = [editor._vae_decode(lat) for _ in range(n)]
        float(sum(jnp.sum(o.astype(jnp.float32)) for o in outs))
        t = (time.time() - t0) / n
        print(f"  {label:42s} {t*1e3:7.1f} ms", flush=True)
        return outs[0]

    # The first timed arm of a process runs ~2x slow (relay stream /
    # allocator warm-up — measured 83 vs 44 ms on identical XLA-encoder
    # arms); burn it on a throwaway.
    run("warmup arm (discard)")
    with flags.override(use_pallas_conv=False):
        a = run("xla decoder")
    with flags.override(
        use_pallas_conv=True, use_fused_resnet=True, use_fused_up2=True
    ):
        b = run("pallas decoder (fused resnet + up2)")
    with flags.override(
        use_pallas_conv=True, use_fused_resnet=False, use_fused_up2=False
    ):
        run("pallas decoder (bare convs, r2 config)")
    with flags.override(
        use_pallas_conv=True, use_fused_resnet=True, use_fused_up2=False
    ):
        run("pallas decoder (fused resnet, xla up2)")
    with flags.override(
        use_pallas_conv=True, use_fused_resnet=False, use_fused_up2=True
    ):
        run("pallas decoder (up2 only)")
    run("default dispatch")
    editor._rebuild_stages()
    err = float(
        jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    )
    print(f"  max |xla - pallas| (uint8 scale): {err:.2f}")


def bench_encode():
    """In-context VAE encode A/B: XLA vs Pallas conv variants.

    Round-2/3 measured XLA winning (43.7-44.4 vs 55.7-56.7 ms) with the
    stride-2 downsamplers still on XLA — partial Pallas coverage
    re-ignited the layout war.  conv3x3_down2 (phase-decomposed strided
    conv) now completes coverage; the matrix below decides
    flags.use_pallas_conv_encode's default (honest-flag policy).
    Queue-10-sync-1 timing like bench_decode.
    """
    import numpy as np
    from fastedit_tpu import FastEditor
    from fastedit_tpu.ops import flags

    editor = FastEditor("ssd-1b", random_weights=True)
    img = jnp.asarray(
        np.random.default_rng(0).uniform(-1.0, 1.0, (1, 1024, 1024, 3)),
        editor.dtype,
    )
    key = jax.random.PRNGKey(0)

    def run(label):
        editor._rebuild_stages()
        float(jnp.sum(editor._vae_encode(img, key).astype(jnp.float32)))
        n = 10
        t0 = time.time()
        outs = [editor._vae_encode(img, key) for _ in range(n)]
        float(sum(jnp.sum(o.astype(jnp.float32)) for o in outs))
        t = (time.time() - t0) / n
        print(f"  {label:42s} {t*1e3:7.1f} ms", flush=True)
        return outs[0]

    run("warmup arm (discard)")  # first timed arm runs ~2x slow (see bench_decode)
    with flags.override(use_pallas_conv=False):
        a = run("xla encoder")
    with flags.override(
        use_pallas_conv=True, use_fused_resnet=True, use_fused_down2=True
    ):
        b = run("pallas encoder (fused resnet + down2)")
    with flags.override(
        use_pallas_conv=True, use_fused_resnet=True, use_fused_down2=False
    ):
        run("pallas encoder (fused resnet, xla downsample)")
    with flags.override(
        use_pallas_conv=True, use_fused_resnet=False, use_fused_down2=True
    ):
        run("pallas encoder (bare convs + down2)")
    run("default dispatch")
    editor._rebuild_stages()
    err = float(
        jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    )
    print(f"  max |xla - pallas| (latent scale): {err:.4f}")


def bench_denoise():
    """In-context denoise-loop A/B over the fused-kernel flag matrix.

    The denoise loop runs with use_pallas_conv_denoise ON; whether the
    whole-resnet fusion and the phase-decomposed upsample conv help
    *inside the loop* (UNet stage shapes, CFG batch 2) is a separate
    question from the decoder — microbenches said fused resnet is
    neutral-to-worse on UNet shapes (0.84-0.99x) but wins on decoder
    shapes.  This measures the real 3-step CFG denoise under each combo.
    """
    import numpy as np
    from fastedit_tpu import FastEditor
    from fastedit_tpu.ops import flags
    from fastedit_tpu.pipeline import stages
    from fastedit_tpu.sched.lcm import make_schedule

    editor = FastEditor("ssd-1b", random_weights=True)
    rng = np.random.default_rng(0)
    r = editor.resolution
    latents = jnp.asarray(
        rng.standard_normal((1, r // 8, r // 8, 4)), editor.dtype
    )
    control = jnp.asarray(rng.standard_normal((1, r, r, 3)), editor.dtype)
    ctx = jnp.asarray(rng.standard_normal((2, 77, 2048)), editor.dtype)
    pooled = jnp.asarray(rng.standard_normal((2, 1280)), editor.dtype)
    time_ids = stages.make_sdxl_time_ids(2, r)
    schedule = make_schedule(editor.scheduler_config, 4, strength=0.8)
    key = jax.random.PRNGKey(0)

    # raw per-arm measurements, keyed by label; every call to run()
    # appends, so the alternating-rep tail below yields 3 samples per
    # contender.  Dumped to flag_matrix_denoise.json so a future retune
    # can check whether a sub-1% margin replicates (advisor r4 ask).
    raw: dict[str, list[float]] = {}

    def run(label):
        editor._rebuild_stages()

        def go():
            # _denoise donates the latents buffer — hand it a fresh copy.
            return editor._denoise(
                jnp.copy(latents), ctx, pooled, time_ids, control, schedule,
                jnp.float32(1.5), jnp.float32(0.5), key, do_cfg=True,
            )

        float(jnp.sum(go().astype(jnp.float32)))  # compile
        # Queue-n-sync-1 (same policy as bench_decode): one scalar
        # readback at the end amortizes the ~25-40 ms relay ack that a
        # per-call sync would charge to every iteration.
        n = 6
        t0 = time.time()
        outs = [go() for _ in range(n)]
        float(sum(jnp.sum(o.astype(jnp.float32)) for o in outs))
        t = (time.time() - t0) / n
        raw.setdefault(label, []).append(t * 1e3)
        print(f"  {label:46s} {t*1e3:7.1f} ms", flush=True)

    run("warmup arm (discard)")  # first timed arm runs ~2x slow (see bench_decode)
    run("default dispatch")
    with flags.override(use_fused_resnet=False, use_fused_up2=False):
        run("pallas convs, no fusion (r2 config)")
    with flags.override(use_fused_resnet=True, use_fused_up2=True):
        run("pallas convs + fused resnet + up2")
    with flags.override(use_fused_resnet=False, use_fused_up2=True):
        run("pallas convs + up2 only")
    with flags.override(use_fused_resnet=True, use_fused_up2=False):
        run("pallas convs + fused resnet only")
    with flags.override(use_fused_resnet=False, use_fused_up2=True,
                        use_fused_down2=True):
        run("pallas convs + up2 + down2 (strided downsamplers)")
    with flags.override(use_pallas_conv=False):
        run("xla convs everywhere")

    # Alternating-rep tail for the two default-deciding contenders (the
    # ~0.3% down2 margin): 3 back-to-back A/B pairs so the artifact shows
    # whether the ordering replicates rep-over-rep, not just once.
    for _ in range(3):
        with flags.override(use_fused_resnet=False, use_fused_up2=True,
                            use_fused_down2=True):
            run("A/B: up2 + down2 (denoise default)")
        with flags.override(use_fused_resnet=False, use_fused_up2=True,
                            use_fused_down2=False):
            run("A/B: up2 only")

    import json
    art = {
        "unit": "ms per 3-step CFG denoise (queue-6-sync-1)",
        "device": str(jax.devices()[0]),
        "raw_ms": {k: [round(v, 2) for v in vs] for k, vs in raw.items()},
    }
    with open("flag_matrix_denoise.json", "w") as f:
        json.dump(art, f, indent=1)
    print("  wrote flag_matrix_denoise.json (raw per-rep times)", flush=True)


def bench_matmul():
    """Transformer-block dense shapes (bf16, fp32 accum)."""
    key = jax.random.PRNGKey(3)
    print("dense matmul (bf16):")
    shapes = [
        (8192, 640, 640),     # stage-2 qkv/out proj (S=4096, CFG batch 2)
        (8192, 640, 5120),    # stage-2 GEGLU up
        (8192, 2560, 640),    # stage-2 GEGLU down
        (2048, 1280, 1280),   # stage-3 qkv/out
        (2048, 1280, 10240),  # stage-3 GEGLU up
        (2048, 5120, 1280),   # stage-3 GEGLU down
    ]
    for m, k_, n in shapes:
        ka, kb = jax.random.split(key)
        a = jax.random.normal(ka, (m, k_), jnp.bfloat16)
        w = jax.random.normal(kb, (k_, n), jnp.bfloat16) * 0.02
        w_back = jax.random.normal(kb, (n, k_), jnp.bfloat16) * 0.02
        flops = 2 * m * k_ * n * 2  # fwd + back-projection per iteration

        def mm(x):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
            return jnp.dot(y, w_back, preferred_element_type=jnp.float32).astype(
                x.dtype
            )

        t = _time(mm, a)
        print(
            f"  [{m:5d},{k_:5d}]x[{k_:5d},{n:5d}] (+back): {t*1e3:7.3f} ms"
            f" ({flops/t/1e12:5.1f} TF/s)",
            flush=True,
        )


def bench_resize():
    """Nearest 2x upsample (UNet/VAE upsamplers) + LCM-loop glue ops."""
    key = jax.random.PRNGKey(4)
    print("nearest 2x upsample (bf16):")
    for b, h, w_, c in [(2, 32, 32, 1280), (2, 64, 64, 640), (1, 128, 128, 512),
                        (1, 256, 256, 512), (1, 512, 512, 256)]:
        x = jax.random.normal(key, (b, h, w_, c), jnp.bfloat16)
        gb = (b * h * w_ * c * 2 * 5) / 1e9  # 1 read + 4 writes

        def up_then_down(xx):
            y = jax.image.resize(xx, (b, 2 * h, 2 * w_, c), "nearest")
            return y[:, ::2, ::2, :]

        t = _time(up_then_down, x)
        print(
            f"  {b}x{h:4d}x{w_:4d}x{c:4d} -> 2x: {t*1e3:7.3f} ms"
            f" ({gb/t:5.0f} GB/s incl downsample)",
            flush=True,
        )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", file=sys.stderr)
    if which in ("conv", "all"):
        bench_conv()
    if which in ("chain", "all"):
        bench_chain()
    if which in ("gn", "all"):
        bench_gn()
    if which in ("fused", "all"):
        bench_fused()
    if which in ("up2", "all"):
        bench_up2()
    if which in ("attn", "all"):
        bench_attn()
    if which in ("decode",):
        bench_decode()
    if which in ("encode",):
        bench_encode()
    if which in ("denoise",):
        bench_denoise()
    if which in ("matmul", "all"):
        bench_matmul()
    if which in ("resize", "all"):
        bench_resize()
