"""Benchmark: seconds per 1024² 4-step LCM ControlNet edit on one TPU chip.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, ...}

Baseline: the reference's headline 6 s/image (SSD-1B fp16 + CPU offload on
an RTX 3060 Laptop, README.md:239 / BASELINE.md).  ``vs_baseline`` is the
speedup factor (baseline_time / our_time).

Runs the full edit path (Canny -> prompt encode -> VAE encode -> fused
ControlNet+UNet+CFG+LCM loop -> VAE decode) with the SSD-1B-architecture
model (1.300 B-param UNet: pruned down path, no mid block, asymmetric up
path) in bf16, zero weights (latency is weight-independent).  The
reference's shipped-config semantics are used: 4 steps at strength 0.8
(=> 3 executed), CFG 1.5, ControlNet scale 0.5.

Self-auditing design (round-4 verdict Next #1/#3):
  * The CFG-1.5 and guidance-1.0 (the reference notebook's actual shipped
    config, run_benchmark_colab.ipynb cell 11) latency phases are
    INTERLEAVED A/B so slow relay drift between phases can never invert
    their ordering again (r4's 0.853 s no-CFG artifact).
  * Every end-to-end number has a device-only twin (device-resident inputs,
    4-byte scalar-readback sync) separating relay transfer from compute.
  * Per-stage ms are device-isolated: all stage inputs are staged + synced
    BEFORE the timed region, so 'prepare' no longer carries the ~0.3 s
    relay upload of the uint8 image (reported separately as upload_ms).
  * achieved_tflops / mfu_pct: XLA cost-analysis FLOPs of the fused edit
    program / measured device seconds / 197 TF/s (v5e bf16 peak).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    from PIL import Image

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    # Device-discovery watchdog: when the remote-TPU relay is down, the
    # first jax call blocks indefinitely (observed >300 s with no error).
    # Fail fast with a diagnostic JSON line instead of hanging the harness.
    # Discovery normally completes in seconds; compile time (minutes) is
    # AFTER this and unaffected.  Tune via BENCH_DEVICE_TIMEOUT_S.
    import threading

    probe_done = threading.Event()

    def _watchdog():
        timeout = float(os.environ.get("BENCH_DEVICE_TIMEOUT_S", "600"))
        if not probe_done.wait(timeout):
            print(
                json.dumps(
                    {
                        "metric": "seconds_per_edit",
                        "value": None,
                        "unit": "s",
                        "vs_baseline": None,
                        "error": (
                            f"device discovery did not complete in "
                            f"{timeout:.0f}s (TPU relay unreachable)"
                        ),
                    }
                ),
                flush=True,
            )
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    probe_done.set()
    print(f"[bench] devices: {devs}", file=sys.stderr)

    from fastedit_tpu import FastEditor

    t0 = time.time()
    editor = FastEditor("ssd-1b", random_weights=True)
    print(f"[bench] init {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (1024, 1024, 3), dtype=np.uint8))

    t0 = time.time()
    editor.edit(img, "a rusty bicycle on a beach", seed=0)
    print(f"[bench] warmup cfg (compile) {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    editor.edit(img, "warmup nocfg", seed=0, guidance_scale=1.0)
    print(f"[bench] warmup nocfg (compile) {time.time()-t0:.1f}s", file=sys.stderr)
    # First dispatch after a compile runs ~2-3x slow through the relay; burn
    # one throwaway per variant so the medians measure steady state.
    editor.edit(img, "throwaway cfg", seed=99)
    editor.edit(img, "throwaway nocfg", seed=99, guidance_scale=1.0)

    # Interleaved latency phase: CFG 1.5 (primary) vs guidance 1.0 (the
    # reference notebook's shipped config) alternate iteration by iteration,
    # so relay drift hits both equally (r4 verdict Next #1).  Fresh prompt
    # each iter to include prompt encoding.
    iters = 6
    times, times_nocfg = [], []
    for i in range(iters):
        t0 = time.time()
        editor.edit(img, f"a rusty bicycle on a beach {i}", seed=i)
        times.append(time.time() - t0)
        t0 = time.time()
        editor.edit(img, f"a rusty bicycle {i} nocfg", seed=i, guidance_scale=1.0)
        times_nocfg.append(time.time() - t0)
    value = float(np.median(times))
    value_nocfg = float(np.median(times_nocfg))
    print(f"[bench] per-iter cfg:   {[round(x, 3) for x in times]}", file=sys.stderr)
    print(
        f"[bench] per-iter nocfg: {[round(x, 3) for x in times_nocfg]}",
        file=sys.stderr,
    )

    # Batch-4 throughput phase (edits/min/chip).
    imgs = [
        Image.fromarray(rng.integers(0, 255, (1024, 1024, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    t0 = time.time()
    editor.edit_batch(imgs, [f"warmup batch prompt {i}" for i in range(4)], seed=0)
    print(f"[bench] batch warmup (compile) {time.time()-t0:.1f}s", file=sys.stderr)
    # Sustained throughput the way a sweep runs (parallel/batch.py): lag-1
    # pipeline — chunk i's device->host readback streams while chunk i+1
    # uploads and computes — and chunks staged as pre-resized uint8 arrays,
    # which is what the sweep's background loader thread hands the editor
    # (the per-chunk PIL decode+LANCZOS cost is off the critical path
    # there; prompts stay novel per chunk so text encoding is measured).
    # Uploads are double-buffered exactly as the sweep does it: a staging
    # thread device_puts chunk i+1's uint8 batch while chunk i computes
    # (editor.stage_inputs <- parallel/batch._load_chunk), so the ~12 MB
    # relay upload is off the dispatch critical path.
    from concurrent.futures import ThreadPoolExecutor

    chunk_u8 = np.stack([np.asarray(im, dtype=np.uint8) for im in imgs])
    nchunks = 8
    stager = ThreadPoolExecutor(max_workers=1, thread_name_prefix="stage")
    t0 = time.time()
    marks = []
    pending = None
    staged = stager.submit(editor.stage_inputs, chunk_u8)
    for i in range(nchunks):
        inputs = staged.result()
        if i + 1 < nchunks:
            staged = stager.submit(editor.stage_inputs, chunk_u8)
        handle = editor.edit_batch_async(
            inputs, [f"a prompt {i} variant {j}" for j in range(4)], seed=i
        )
        if pending is not None:
            pending.result()
            marks.append(time.time() - t0)
        pending = handle
    pending.result()
    marks.append(time.time() - t0)
    stager.shutdown()
    # Steady state excludes the first chunk: the first timed dispatch of a
    # phase runs ~2-3x slow through the relay (same warm-up artifact the
    # bench_conv A/B harnesses burn a throwaway arm on).
    raw_deltas = [b - a for a, b in zip(marks, marks[1:])]
    # median of steady-chunk deltas, not the mean: one relay stall in an
    # 8-chunk phase (observed 2.4 s vs 1.7 s steady) should not distort the
    # captured number by 5-10%
    per_batch = float(np.median(raw_deltas))
    epm = 4 * 60.0 / per_batch
    deltas = [round(marks[0], 3)] + [round(d, 3) for d in raw_deltas]
    print(
        f"[bench] pipelined batch-4 x{nchunks}: chunk deltas {deltas} "
        f"-> steady (median) {per_batch:.3f} s/batch -> {epm:.1f} "
        f"edits/min/chip",
        file=sys.stderr,
    )

    # Device-only batch-4 ceiling: the sweep program on device-resident
    # staged inputs, scalar-sync — what the chip supports with the host/
    # relay IO fully off the critical path (a co-located production host's
    # sustainable rate; the pipelined number above additionally carries
    # this environment's ~25 MB/chunk relay traffic at ~16 MB/s).
    import jax
    import jax.numpy as jnp

    epm_device = None
    staged_dev = editor.stage_inputs(chunk_u8)
    dev_prompts = ["a device ceiling prompt %d" % j for j in range(4)]
    editor._encode_prompts_batched(dev_prompts + [""])
    enc4 = [editor._encode_prompt_cached(p) for p in dev_prompts]
    bctx_c = jnp.concatenate([e[0] for e in enc4])
    bpooled_c = jnp.concatenate([e[1] for e in enc4])
    bctx_u1, bpooled_u1 = editor._encode_prompt_cached("")
    bctx_u = jnp.tile(bctx_u1, (4, 1, 1))
    bpooled_u = jnp.tile(bpooled_u1, (4, 1))
    bctx = jnp.stack([bctx_u, bctx_c], axis=1).reshape(8, *bctx_c.shape[1:])
    bpooled = jnp.stack([bpooled_u, bpooled_c], axis=1).reshape(
        8, *bpooled_c.shape[1:]
    )
    bargs = (
        staged_dev,
        jnp.float32(100.0),
        jnp.float32(200.0),
        bctx,
        bpooled,
        editor._cached_const("time_ids", 8, editor.resolution),
        editor._cached_schedule(4, 0.8),
        jnp.float32(1.5),
        jnp.float32(0.5),
    )

    def run_batch_dev(i):
        out = editor._edit_core(
            *bargs, jax.random.PRNGKey(i), do_cfg=True, tile_noise=True
        )
        float(jnp.sum(out.astype(jnp.float32)))  # relay-safe scalar sync

    run_batch_dev(0), run_batch_dev(1)  # warm + burn
    bdts = []
    for i in range(5):
        t0 = time.time()
        run_batch_dev(i)
        bdts.append(time.time() - t0)
    batch_dev_s = float(np.median(bdts))
    epm_device = 4 * 60.0 / batch_dev_s
    print(
        f"[bench] device-only batch-4: {[round(x, 3) for x in bdts]} "
        f"-> {epm_device:.1f} edits/min/chip ceiling",
        file=sys.stderr,
    )
    del staged_dev, bargs

    # Device-only latency: the fused edit program on device-resident inputs,
    # synced by a 4-byte scalar readback.  Excludes the host<->device
    # transfer of the two 3 MB uint8 images, which through this
    # environment's remote-TPU relay costs ~0.3 s (measured ~16 MB/s) but
    # is sub-ms for a production host co-located with its TPU.  Both CFG
    # variants, interleaved.
    prompt = "a rusty bicycle on a beach"
    editor._encode_prompts_batched([prompt, ""])
    ctx_c, pooled_c = editor._encode_prompt_cached(prompt)
    ctx_u, pooled_u = editor._encode_prompt_cached("")
    inputs1 = jnp.asarray(np.asarray(img, dtype=np.uint8)[None])

    def make_runner(do_cfg):
        if do_cfg:
            context = jnp.concatenate([ctx_u, ctx_c])
            pooled = jnp.concatenate([pooled_u, pooled_c])
            nb, g = 2, 1.5
        else:
            context, pooled, nb, g = ctx_c, pooled_c, 1, 1.0
        args = (
            inputs1,
            jnp.float32(100.0),
            jnp.float32(200.0),
            context,
            pooled,
            editor._cached_const("time_ids", nb, editor.resolution),
            editor._cached_schedule(4, 0.8),
            jnp.float32(g),
            jnp.float32(0.5),
            jax.random.PRNGKey(0),
        )

        def run():
            out = editor._edit_core(*args, do_cfg=do_cfg, tile_noise=False)
            float(jnp.sum(out.astype(jnp.float32)))  # relay-safe scalar sync

        return run, args

    run_cfg, args_cfg = make_runner(True)
    run_nocfg, args_nocfg = make_runner(False)
    run_cfg(), run_nocfg(), run_cfg(), run_nocfg()  # warm + burn
    dts, dts_nocfg = [], []
    for _ in range(5):
        t0 = time.time()
        run_cfg()
        dts.append(time.time() - t0)
        t0 = time.time()
        run_nocfg()
        dts_nocfg.append(time.time() - t0)
    device_s = float(np.median(dts))
    device_s_nocfg = float(np.median(dts_nocfg))
    print(f"[bench] device-only cfg:   {[round(x, 3) for x in dts]}", file=sys.stderr)
    print(
        f"[bench] device-only nocfg: {[round(x, 3) for x in dts_nocfg]}",
        file=sys.stderr,
    )

    # MFU accounting (round-4 verdict Next #3): analytic matmul/conv FLOPs
    # of the fused edit program (utils/flops.py — XLA's cost_analysis cannot
    # audit it: Pallas custom calls report zero flops and fori_loop/scan
    # bodies are counted once, not per trip; the analytic walk is itself
    # pinned against XLA cost analysis on XLA-only loop-free forwards in
    # tests/test_flops.py) / measured device-only seconds / v5e bf16 peak.
    achieved_tflops = mfu_pct = flops_per_edit = None
    try:
        from fastedit_tpu.models import configs as C
        from fastedit_tpu.utils import flops as flops_lib

        flops_per_edit = flops_lib.edit_flops(
            C.SSD1B_UNET, C.SDXL_CONTROLNET_SMALL, C.SDXL_VAE,
            resolution=1024, num_steps_run=3, do_cfg=True,
        )
        achieved_tflops = flops_per_edit / device_s / 1e12
        mfu_pct = 100.0 * achieved_tflops / V5E_BF16_PEAK_TFLOPS
        print(
            f"[bench] analytic flops/edit {flops_per_edit/1e12:.2f} TF "
            f"-> {achieved_tflops:.1f} TF/s achieved = {mfu_pct:.1f}% of "
            f"{V5E_BF16_PEAK_TFLOPS:.0f} TF/s peak",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover - bench resilience
        print(f"[bench] flops accounting failed: {e!r}", file=sys.stderr)

    # Per-stage DEVICE-ISOLATED breakdown: every stage input is staged on
    # device and synced before its timed region, so the table separates
    # compute from relay transfer (the upload itself is reported once as
    # upload_ms).  The production edit() runs the fused single-dispatch
    # program; the per-stage sum is its additive upper bound (each stage
    # still pays one dispatch RTT through the relay).  Guarded: a failure
    # here must not cost the primary metric.
    stage_ms = None
    upload_ms = None
    try:
        from fastedit_tpu.pipeline import stages as stages_lib
        from fastedit_tpu.sched.lcm import make_schedule
        from fastedit_tpu.utils.profiling import StageTimer, sync

        u8 = np.asarray(img, dtype=np.uint8)
        # measure the uint8 upload once (relay transfer, not compute)
        t0 = time.time()
        img_dev = jax.device_put(jnp.asarray(u8))
        sync(img_dev)
        upload_ms = round(1000.0 * (time.time() - t0), 1)

        timer = StageTimer()
        sched = make_schedule(editor.scheduler_config, 4, strength=0.8)
        ctx_u2, pooled_u2 = editor._encode_prompt_cached("")
        for i in range(4):
            if i == 1:
                timer = StageTimer()  # iteration 0 compiles; report 1..3
            sprompt = f"a rusty bicycle stage {i}"
            # stage inputs prepared + synced OUTSIDE the timed regions
            ids1 = jnp.asarray(editor.tokenizer.encode(sprompt))[None]
            ids2 = jnp.asarray(editor.tokenizer_2.encode(sprompt))[None]
            sync((ids1, ids2))
            with timer.stage("encode_prompt") as out:
                sctx, spooled = editor._encode_prompt(ids1, ids2)
                out["result"] = sctx
            scontext = jnp.concatenate([ctx_u2, sctx])
            spooled = jnp.concatenate([pooled_u2, spooled])
            stime_ids = stages_lib.make_sdxl_time_ids(2, editor.resolution)
            skey = jax.random.PRNGKey(i)
            skey, k_enc = jax.random.split(skey)
            sync((scontext, spooled, stime_ids, skey, k_enc))
            with timer.stage("prepare") as out:
                control, vae_in = editor._prepare(
                    img_dev, jnp.float32(100), jnp.float32(200)
                )
                out["result"] = (control, vae_in)
            with timer.stage("vae_encode") as out:
                lat = editor._vae_encode(vae_in, k_enc)
                out["result"] = lat
            with timer.stage("denoise") as out:
                lat = editor._denoise(
                    lat, scontext, spooled, stime_ids, control, sched,
                    jnp.float32(1.5), jnp.float32(0.5), skey, do_cfg=True,
                )
                out["result"] = lat
            with timer.stage("vae_decode") as out:
                dec = editor._vae_decode(lat)
                out["result"] = dec
        stage_ms = {
            k: round(1000.0 * timer.totals[k] / timer.counts[k], 1)
            for k in timer.totals
        }
        print(
            f"[bench] device-isolated stage ms: {stage_ms} "
            f"(uint8 upload: {upload_ms} ms relay transfer)",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover - bench resilience
        print(f"[bench] stage phase failed: {e!r}", file=sys.stderr)

    # SDXL phase (round-2 verdict Next #8): the reference's headline table
    # covers four configs; SDXL (2.567 B UNet + LoRA-fused LCM) is the
    # worst-case HBM/latency one (BASELINE.md rows 4-5: ~113 s fp16 with
    # offload on the 6 GB reference GPU).  End-to-end AND device-only, so
    # relay drift in this late phase is visible instead of conflated
    # (r4's 0.79-vs-0.92 spread).  Guarded: a failure here must not cost
    # the primary SSD-1B metric.
    hbm = editor.get_memory_usage().get("allocated_gb", 0.0)
    value_sdxl = None
    device_s_sdxl = None
    try:
        # Release SSD-1B HBM before the 5.1 GB SDXL weights load (the
        # runner closures would otherwise keep the editor's params alive).
        del editor, run_cfg, run_nocfg, args_cfg, args_nocfg, inputs1
        t0 = time.time()
        editor_xl = FastEditor("sdxl", random_weights=True)
        print(f"[bench] sdxl init {time.time()-t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        editor_xl.edit(img, "warmup sdxl", seed=0)
        print(
            f"[bench] sdxl warmup (compile) {time.time()-t0:.1f}s",
            file=sys.stderr,
        )
        editor_xl.edit(img, "throwaway sdxl", seed=99)
        xt = []
        for i in range(5):
            t0 = time.time()
            editor_xl.edit(img, f"a rusty bicycle {i} sdxl", seed=i)
            xt.append(time.time() - t0)
        value_sdxl = float(np.median(xt))
        print(
            f"[bench] sdxl per-iter: {[round(x, 3) for x in xt]}",
            file=sys.stderr,
        )
        # device-only twin
        xprompt = "a rusty bicycle on a beach"
        editor_xl._encode_prompts_batched([xprompt, ""])
        xc, xp = editor_xl._encode_prompt_cached(xprompt)
        xu, xpu = editor_xl._encode_prompt_cached("")
        xargs = (
            jnp.asarray(np.asarray(img, dtype=np.uint8)[None]),
            jnp.float32(100.0),
            jnp.float32(200.0),
            jnp.concatenate([xu, xc]),
            jnp.concatenate([xpu, xp]),
            editor_xl._cached_const("time_ids", 2, editor_xl.resolution),
            editor_xl._cached_schedule(4, 0.8),
            jnp.float32(1.5),
            jnp.float32(0.5),
            jax.random.PRNGKey(0),
        )

        def run_xl():
            out = editor_xl._edit_core(*xargs, do_cfg=True, tile_noise=False)
            float(jnp.sum(out.astype(jnp.float32)))

        run_xl(), run_xl()
        xdts = []
        for _ in range(5):
            t0 = time.time()
            run_xl()
            xdts.append(time.time() - t0)
        device_s_sdxl = float(np.median(xdts))
        print(
            f"[bench] sdxl device-only: {[round(x, 3) for x in xdts]}",
            file=sys.stderr,
        )
        del editor_xl
    except Exception as e:  # pragma: no cover - bench resilience
        print(f"[bench] sdxl phase failed: {e!r}", file=sys.stderr)

    baseline = 6.0  # s/image, reference headline (BASELINE.md speed table)
    record = {
        "metric": "seconds_per_1024px_4step_edit",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(baseline / value, 2),
        "edits_per_min_per_chip_batch4": round(epm, 1),
        "edits_per_min_per_chip_batch4_device": (
            round(epm_device, 1) if epm_device else None
        ),
        "device_seconds_per_edit": round(device_s, 4),
        "seconds_per_edit_guidance1_notebook_cfg": round(value_nocfg, 4),
        "device_seconds_per_edit_guidance1": round(device_s_nocfg, 4),
    }
    if flops_per_edit is not None:
        record["flops_per_edit_tf"] = round(flops_per_edit / 1e12, 3)
        record["achieved_tflops_device"] = round(achieved_tflops, 1)
        record["mfu_pct_device"] = round(mfu_pct, 1)
    if stage_ms:
        record["stage_ms_device_isolated"] = stage_ms
        record["upload_ms_relay"] = upload_ms
    if value_sdxl is not None:
        record["sdxl_seconds_per_edit"] = round(value_sdxl, 4)
    if device_s_sdxl is not None:
        record["sdxl_device_seconds_per_edit"] = round(device_s_sdxl, 4)
        try:
            from fastedit_tpu.models import configs as C
            from fastedit_tpu.utils import flops as flops_lib

            xl_flops = flops_lib.edit_flops(
                C.SDXL_UNET, C.SDXL_CONTROLNET_SMALL, C.SDXL_VAE,
                resolution=1024, num_steps_run=3, do_cfg=True,
            )
            record["sdxl_achieved_tflops_device"] = round(
                xl_flops / device_s_sdxl / 1e12, 1
            )
        except Exception:  # pragma: no cover - bench resilience
            pass
    if hbm > 0:  # the relay backend does not always expose memory_stats
        record["hbm_in_use_gb"] = round(hbm, 2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
