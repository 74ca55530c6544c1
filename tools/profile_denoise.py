"""Capture a fresh device-op breakdown of the denoise loop / VAE decode.

Runs the current default dispatch (whatever flags pick on this backend),
captures a jax.profiler trace of the warm program, and prints per-op
device time aggregated by op name so the next perf lever is visible.

Usage: python tools/profile_denoise.py [denoise|decode] [trace_dir]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def run_denoise(editor):
    from fastedit_tpu.pipeline import stages
    from fastedit_tpu.sched.lcm import make_schedule

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

    def go():
        out = editor._denoise(
            jnp.copy(latents), ctx, pooled, time_ids, control, schedule,
            jnp.float32(1.5), jnp.float32(0.5), key, do_cfg=True,
        )
        return float(jnp.sum(out.astype(jnp.float32)))

    return go


def run_decode(editor):
    rng = np.random.default_rng(0)
    lat = jnp.asarray(
        rng.standard_normal((1, 128, 128, 4)), editor.dtype
    )

    def go():
        return float(
            jnp.sum(editor._vae_decode(lat).astype(jnp.float32))
        )

    return go


def run_encode(editor):
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.uniform(-1.0, 1.0, (1, 1024, 1024, 3)), editor.dtype
    )
    key = jax.random.PRNGKey(0)

    def go():
        return float(
            jnp.sum(editor._vae_encode(img, key).astype(jnp.float32))
        )

    return go


def run_edit(editor):
    import jax.numpy as jnp

    from fastedit_tpu.pipeline import stages

    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.integers(0, 255, (1, 1024, 1024, 3), dtype=np.uint8)
    )
    ctx = jnp.asarray(rng.standard_normal((2, 77, 2048)), editor.dtype)
    pooled = jnp.asarray(rng.standard_normal((2, 1280)), editor.dtype)
    args = (
        img,
        jnp.float32(100.0),
        jnp.float32(200.0),
        ctx,
        pooled,
        editor._cached_const("time_ids", 2, editor.resolution),
        editor._cached_schedule(4, 0.8),
        jnp.float32(1.5),
        jnp.float32(0.5),
        jax.random.PRNGKey(0),
    )

    def go():
        out = editor._edit_core(*args, do_cfg=True, tile_noise=False)
        return float(jnp.sum(out.astype(jnp.float32)))

    return go


def parse_trace(trace_dir: str, top: int = 40) -> None:
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        print("no trace.json.gz found under", trace_dir)
        return
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    evs = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    durs, cnt = collections.Counter(), collections.Counter()
    total = 0
    for e in evs:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            name = e.get("name", "?")
            d = e.get("dur", 0)
            if name.startswith("jit_"):
                total += d
                continue
            durs[name] += d
            cnt[name] += 1
    print(f"total jitted program device time: {total/1e3:.2f} ms")
    acc = 0
    for name, d in durs.most_common(top):
        acc += d
        print(f"{d/1e3:9.2f} ms  x{cnt[name]:4d}  {name[:100]}")
    rest = sum(durs.values()) - acc
    print(f"{rest/1e3:9.2f} ms  (everything else)")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "denoise"
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/prof_{which}_r3"
    from fastedit_tpu import FastEditor

    editor = FastEditor("ssd-1b", random_weights=True)
    go = {
        "denoise": run_denoise, "decode": run_decode, "encode": run_encode, "edit": run_edit,
    }[which](editor)
    go()  # compile
    t0 = time.time()
    go()
    print(f"warm wall: {(time.time()-t0)*1e3:.1f} ms", flush=True)
    with jax.profiler.trace(trace_dir):
        go()
    parse_trace(trace_dir)


if __name__ == "__main__":
    main()
