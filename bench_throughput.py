"""Throughput benchmark: 1024² 4-step edits per minute per chip (batched).

The BASELINE.json headline metric is "edits/min/chip": latency-optimal
single edits leave the MXU idle during host work; batching amortizes it.
Prints one JSON line like bench.py (run separately; the driver's bench.py
remains the latency benchmark).

Usage: python bench_throughput.py [batch_size]
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    editor = FastEditor("ssd-1b", random_weights=True)

    rng = np.random.default_rng(0)
    images = [
        Image.fromarray(rng.integers(0, 255, (1024, 1024, 3), dtype=np.uint8))
        for _ in range(batch)
    ]
    prompts = [f"a rusty bicycle {i}" for i in range(batch)]

    t0 = time.time()
    editor.edit_batch(images, prompts, seed=0)
    print(f"[bench] warmup (compile) {time.time()-t0:.1f}s", file=sys.stderr)

    # Sustained throughput the way sweeps run (parallel/batch.py): lag-1
    # pipeline so chunk i's readback streams under chunk i+1's compute.
    iters = 5
    t0 = time.time()
    pending = None
    for i in range(iters):
        handle = editor.edit_batch_async(
            images, [f"{p} v{i}" for p in prompts], seed=i
        )
        if pending is not None:
            pending.result()
        pending = handle
    pending.result()
    per_image = (time.time() - t0) / (iters * batch)
    edits_per_min = 60.0 / per_image
    print(
        f"[bench] batch={batch} x{iters} pipelined "
        f"-> {per_image:.3f} s/image",
        file=sys.stderr,
    )
    # Reference headline: 6 s/image => 10 edits/min.
    print(
        json.dumps(
            {
                "metric": "edits_per_min_per_chip_1024px_4step",
                "value": round(edits_per_min, 2),
                "unit": "edits/min",
                "vs_baseline": round(edits_per_min / 10.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
