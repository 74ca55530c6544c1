"""Benchmark: seconds per 1024² 4-step LCM ControlNet edit on one TPU chip.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N,
     "edits_per_min_per_chip_batch4": N}

Baseline: the reference's headline 6 s/image (SSD-1B fp16 + CPU offload on
an RTX 3060 Laptop, README.md:239 / BASELINE.md).  ``vs_baseline`` is the
speedup factor (baseline_time / our_time).  The extra field captures batch-4
throughput on the same chip (reference headline ≈ 10 edits/min).

Runs the full edit path (Canny -> prompt encode -> VAE encode -> fused
ControlNet+UNet+CFG+LCM loop -> VAE decode) with the SSD-1B-architecture
model (1.300 B-param UNet: pruned down path, no mid block, asymmetric up
path) in bf16, zero weights (latency is weight-independent).  The
reference's shipped-config semantics are used: 4 steps at strength 0.8
(=> 3 executed), CFG 1.5, ControlNet scale 0.5.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


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
    print(f"[bench] warmup (compile) {time.time()-t0:.1f}s", file=sys.stderr)
    # First dispatch after a compile runs ~2-3x slow through the relay (the
    # same artifact the batch phase burns its first chunk on, below); burn
    # one throwaway so the median measures steady state, not relay warm-up.
    editor.edit(img, "a rusty bicycle on a beach throwaway", seed=99)

    # Steady state: fresh prompt each iter to include prompt encoding.
    iters = 5
    times = []
    for i in range(iters):
        t0 = time.time()
        editor.edit(img, f"a rusty bicycle on a beach {i}", seed=i)
        times.append(time.time() - t0)
    value = float(np.median(times))
    print(f"[bench] per-iter times: {[round(x, 3) for x in times]}", file=sys.stderr)

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
    nchunks = 6
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
    per_batch = (marks[-1] - marks[0]) / (nchunks - 1)
    epm = 4 * 60.0 / per_batch
    deltas = [round(marks[0], 3)] + [
        round(b - a, 3) for a, b in zip(marks, marks[1:])
    ]
    print(
        f"[bench] pipelined batch-4 x{nchunks}: chunk deltas {deltas} "
        f"-> steady {per_batch:.3f} s/batch -> {epm:.1f} edits/min/chip",
        file=sys.stderr,
    )

    # Device-only latency: the fused edit program on device-resident inputs,
    # synced by a 4-byte scalar readback.  Excludes the host<->device
    # transfer of the two 3 MB uint8 images, which through this
    # environment's remote-TPU relay costs ~0.3 s (measured ~16 MB/s) but
    # is sub-ms for a production host co-located with its TPU.
    import jax
    import jax.numpy as jnp

    prompt = "a rusty bicycle on a beach"
    editor._encode_prompts_batched([prompt, ""])
    ctx_c, pooled_c = editor._encode_prompt_cached(prompt)
    ctx_u, pooled_u = editor._encode_prompt_cached("")
    context = jnp.concatenate([ctx_u, ctx_c])
    pooled = jnp.concatenate([pooled_u, pooled_c])
    inputs = jnp.asarray(np.asarray(img, dtype=np.uint8)[None])
    args = (
        inputs,
        jnp.float32(100.0),
        jnp.float32(200.0),
        context,
        pooled,
        editor._cached_const("time_ids", 2, editor.resolution),
        editor._cached_schedule(4, 0.8),
        jnp.float32(1.5),
        jnp.float32(0.5),
        jax.random.PRNGKey(0),
    )

    def run_core():
        out = editor._edit_core(*args, do_cfg=True, tile_noise=False)
        float(jnp.sum(out.astype(jnp.float32)))  # relay-safe scalar sync

    run_core()  # warm (already compiled by the latency phase)
    dts = []
    for _ in range(5):
        t0 = time.time()
        run_core()
        dts.append(time.time() - t0)
    device_s = float(np.median(dts))
    print(
        f"[bench] device-only per-edit: {[round(x, 3) for x in dts]}",
        file=sys.stderr,
    )

    # Per-stage device breakdown (round-3 verdict Next #2): time the
    # unfused stage programs with relay-safe syncs so the kernel-level
    # claims (denoise/decode/encode ms) land in the driver-captured JSON,
    # not just STATUS prose.  The production edit() runs the fused
    # single-dispatch program; the per-stage sum is its additive upper
    # bound.  Guarded: a failure here must not cost the primary metric.
    stage_ms = None
    try:
        from fastedit_tpu.pipeline import stages as stages_lib
        from fastedit_tpu.sched.lcm import make_schedule
        from fastedit_tpu.utils.profiling import StageTimer

        timer = StageTimer()
        u8 = np.asarray(img, dtype=np.uint8)
        for i in range(4):
            if i == 1:
                timer = StageTimer()  # iteration 0 compiles; report 1..3
            sprompt = f"a rusty bicycle stage {i}"
            with timer.stage("prepare") as out:
                control, vae_in = editor._prepare(
                    jnp.asarray(u8), jnp.float32(100), jnp.float32(200)
                )
                out["result"] = (control, vae_in)
            with timer.stage("encode_prompt") as out:
                ids1 = jnp.asarray(editor.tokenizer.encode(sprompt))[None]
                ids2 = jnp.asarray(editor.tokenizer_2.encode(sprompt))[None]
                sctx, spooled = editor._encode_prompt(ids1, ids2)
                out["result"] = sctx
            ctx_u2, pooled_u2 = editor._encode_prompt_cached("")
            scontext = jnp.concatenate([ctx_u2, sctx])
            spooled = jnp.concatenate([pooled_u2, spooled])
            stime_ids = stages_lib.make_sdxl_time_ids(2, editor.resolution)
            skey = jax.random.PRNGKey(i)
            skey, k_enc = jax.random.split(skey)
            with timer.stage("vae_encode") as out:
                lat = editor._vae_encode(vae_in, k_enc)
                out["result"] = lat
            sched = make_schedule(editor.scheduler_config, 4, strength=0.8)
            with timer.stage("denoise") as out:
                lat = editor._denoise(
                    lat, scontext, spooled, stime_ids, control, sched,
                    jnp.float32(1.5), jnp.float32(0.5), skey, do_cfg=True,
                )
                out["result"] = lat
            with timer.stage("vae_decode") as out:
                img_dev = editor._vae_decode(lat)
                out["result"] = img_dev
        stage_ms = {
            k: round(1000.0 * timer.totals[k] / timer.counts[k], 1)
            for k in timer.totals
        }
        print(f"[bench] stage breakdown (ms): {stage_ms}", file=sys.stderr)
    except Exception as e:  # pragma: no cover - bench resilience
        print(f"[bench] stage phase failed: {e!r}", file=sys.stderr)

    # Reference-notebook benchmark config: the Colab run that produced the
    # shipped results used --guidance 1.0 (run_benchmark_colab.ipynb cell
    # 11), which skips CFG at trace time — half the UNet work of the CFG
    # 1.5 primary metric above.
    t0 = time.time()
    editor.edit(img, "warmup nocfg", seed=0, guidance_scale=1.0)
    print(f"[bench] no-CFG warmup (compile) {time.time()-t0:.1f}s", file=sys.stderr)
    editor.edit(img, "throwaway nocfg", seed=99, guidance_scale=1.0)
    nct = []
    for i in range(5):
        t0 = time.time()
        editor.edit(img, f"a rusty bicycle {i} nocfg", seed=i, guidance_scale=1.0)
        nct.append(time.time() - t0)
    value_nocfg = float(np.median(nct))
    print(f"[bench] no-CFG per-iter: {[round(x, 3) for x in nct]}", file=sys.stderr)

    # SDXL phase (round-2 verdict Next #8): the reference's headline table
    # covers four configs; SDXL (2.567 B UNet + LoRA-fused LCM) is the
    # worst-case HBM/latency one (BASELINE.md rows 4-5: ~113 s fp16 with
    # offload on the 6 GB reference GPU).  Guarded: a failure here must not
    # cost the primary SSD-1B metric.
    hbm = editor.get_memory_usage().get("allocated_gb", 0.0)
    value_sdxl = None
    try:
        # Release SSD-1B HBM before the 5.1 GB SDXL weights load (run_core's
        # closure would otherwise keep the editor and its params alive).
        del editor, run_core, args
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
        "device_seconds_per_edit": round(device_s, 4),
        "seconds_per_edit_guidance1_notebook_cfg": round(value_nocfg, 4),
    }
    if stage_ms:
        record["stage_ms"] = stage_ms
    if value_sdxl is not None:
        record["sdxl_seconds_per_edit"] = round(value_sdxl, 4)
    if hbm > 0:  # the relay backend does not always expose memory_stats
        record["hbm_in_use_gb"] = round(hbm, 2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
