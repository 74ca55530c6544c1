"""Data-parallel PIE-Bench sweep: batch entries sharded over the mesh.

Replaces the reference's sequential single-device loop (run_batch.py:176-261)
with chunks of ``mesh data-axis size`` images run through one jitted program
per chunk; per-chunk error isolation and ``--skip_existing`` filesystem
resume are preserved (they compose with DP because outputs stay keyed by the
dataset-relative path).
"""

from __future__ import annotations

import os
import time
from typing import List, Tuple

from PIL import Image
from tqdm import tqdm

from fastedit_tpu import harness


def run_batch_data_parallel(args, editor, selected: List[Tuple[str, dict]],
                            edited_dir: str) -> int:
    mesh = editor.enable_data_parallel()
    chunk_size = int(mesh.shape["data"])

    # Resolve work items up front (skip/missing accounting identical to the
    # sequential path).
    work = []
    skipped = failed = 0
    for image_id, entry in selected:
        try:
            source_path = harness.safe_join(args.source_dir, entry["image_path"])
        except ValueError as e:
            print(f"Invalid path for {image_id}: {e}")
            failed += 1
            continue
        output_path = os.path.join(edited_dir, entry["image_path"])
        if args.skip_existing and os.path.exists(output_path):
            skipped += 1
            continue
        if not os.path.exists(source_path) or not entry.get("editing_prompt"):
            failed += 1
            continue
        work.append((image_id, entry, source_path, output_path))

    processed = 0
    total_time = 0.0
    t_sweep = time.time()
    pbar = tqdm(total=len(work), desc=f"Editing (DP x{chunk_size})")
    pending = None  # (chunk, real, PendingEdit) — lag-1 software pipeline

    def finalize(p) -> int:
        """Materialize a finished chunk's images and save them."""
        nonlocal processed, failed
        chunk, real, handle = p
        try:
            edited = handle.result()
            for (image_id, entry, _, output_path), img in zip(chunk, edited[:real]):
                os.makedirs(os.path.dirname(output_path), exist_ok=True)
                img.save(output_path)
                processed += 1
        except Exception as e:  # chunk-level isolation
            print(f"\nError processing chunk {chunk[0][0]}.. "
                  f"({type(e).__name__}): {e}")
            failed += real
        return real

    for start in range(0, len(work), chunk_size):
        chunk = work[start : start + chunk_size]
        real = len(chunk)
        padded = chunk + [chunk[-1]] * (chunk_size - real)  # pad, drop later
        try:
            images = [Image.open(p).convert("RGB") for _, _, p, _ in padded]
            prompts = [e["editing_prompt"] for _, e, _, _ in padded]
            # Dispatch chunk i (upload + device program + async readback) ...
            handle = editor.edit_batch_async(
                images,
                prompts,
                negative_prompt=args.negative_prompt,
                strength=args.strength,
                num_inference_steps=args.steps,
                guidance_scale=args.guidance,
                controlnet_conditioning_scale=args.control_scale,
                canny_low_threshold=args.canny_low,
                canny_high_threshold=args.canny_high,
                seed=args.seed,
            )
        except Exception as e:  # dispatch-side isolation (bad file etc.)
            print(f"\nError dispatching chunk at {start} ({type(e).__name__}): {e}")
            failed += real
            pbar.update(real)
            continue
        # ... then block on chunk i-1: its device->host copy streamed while
        # chunk i was uploading/computing.
        if pending is not None:
            pbar.update(finalize(pending))
        pending = (chunk, real, handle)
    if pending is not None:
        pbar.update(finalize(pending))
    total_time = time.time() - t_sweep
    pbar.close()

    print(f"\n{'='*60}\nBATCH PROCESSING SUMMARY (data-parallel)\n{'='*60}")
    print(f"\nProcessed:  {processed} images")
    print(f"Skipped:    {skipped} images")
    print(f"Failed:     {failed} images")
    if processed:
        print(f"\nThroughput: {processed / total_time:.2f} images/s "
              f"({total_time / processed:.2f}s/image amortized)")
        print(f"Sweep wall time (pipelined load/edit/readback): {total_time:.2f}s")
    print(f"\nOutputs saved to:\n  - Edited images: {edited_dir}")
    print(f"{'='*60}")
    return 0
