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
    from fastedit_tpu import FastEditor

    t0 = time.time()
    editor = FastEditor("ssd-1b", random_weights=True)
    print(f"[bench] init {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (1024, 1024, 3), dtype=np.uint8))

    t0 = time.time()
    editor.edit(img, "a rusty bicycle on a beach", seed=0)
    print(f"[bench] warmup (compile) {time.time()-t0:.1f}s", file=sys.stderr)

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
    bt = []
    for i in range(3):
        t0 = time.time()
        editor.edit_batch(
            imgs, [f"a prompt {i} variant {j}" for j in range(4)], seed=i
        )
        bt.append(time.time() - t0)
    per_batch = float(np.median(bt))
    epm = 4 * 60.0 / per_batch
    print(
        f"[bench] batch-4 times: {[round(x, 3) for x in bt]} "
        f"-> {epm:.1f} edits/min/chip",
        file=sys.stderr,
    )

    baseline = 6.0  # s/image, reference headline (BASELINE.md speed table)
    print(
        json.dumps(
            {
                "metric": "seconds_per_1024px_4step_edit",
                "value": round(value, 4),
                "unit": "s",
                "vs_baseline": round(baseline / value, 2),
                "edits_per_min_per_chip_batch4": round(epm, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
