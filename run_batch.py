"""Run fast image editing on a batch of PIE-Bench images (TPU).

Flag-compatible with the reference CLI (run_batch.py:45-89) plus TPU extras:
--strength, --checkpoint_dir, --model tiny, and --data_parallel to shard the
sweep over all local devices (the reference runs a sequential single-GPU
loop at run_batch.py:176; SURVEY.md §2.4).

Usage:
    python run_batch.py --num_images 50 --editing_types 0 1 2
"""

import argparse
import json
import os
import time

from PIL import Image
from tqdm import tqdm


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Batch image editing on PIE-Bench")
    p.add_argument("--mapping_file", type=str,
                   default="data/PIE-Bench_v1/mapping_file.json")
    p.add_argument("--source_dir", type=str,
                   default="data/PIE-Bench_v1/annotation_images")
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--model", type=str, default="sdxl",
                   choices=["sdxl", "ssd-1b", "tiny"])
    p.add_argument("--num_images", type=int, default=None)
    p.add_argument("--editing_types", nargs="+", type=str, default=None)
    p.add_argument("--image_ids", nargs="+", type=str, default=None)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--guidance", type=float, default=1.5)
    p.add_argument("--control_scale", type=float, default=0.5)
    p.add_argument("--strength", type=float, default=0.80)
    p.add_argument("--canny_low", type=int, default=100)
    p.add_argument("--canny_high", type=int, default=200)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--no_cpu_offload", action="store_true")
    p.add_argument("--quality_mode", action="store_true")
    p.add_argument("--full_precision", action="store_true")
    p.add_argument("--full_controlnet", action="store_true")
    p.add_argument("--skip_existing", action="store_true")
    p.add_argument("--save_comparisons", action="store_true")
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--data_parallel", action="store_true",
                   help="Shard the sweep over all local devices (ICI DP)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="Tensor-parallel group size over the 'model' mesh "
                        "axis (memory knob for the fp32 configs; implies "
                        "--data_parallel)")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (multi-host DP: one "
                        "controller per host, jax.distributed)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="Total controller processes in the multi-host sweep")
    p.add_argument("--process_id", type=int, default=None,
                   help="This controller's rank in [0, num_processes)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.quality_mode:
        args.full_precision = True
        args.full_controlnet = True
        print("[Quality Mode] Enabled: fp32 + full ControlNet")

    from fastedit_tpu import FastEditor
    from fastedit_tpu import harness

    if args.num_processes and args.num_processes > 1:
        # Multi-host DP: join the cluster before any device use.  Each host
        # runs this same CLI with its own --process_id; the sweep shards the
        # batch over the global mesh and each host saves only its rows.
        if args.coordinator_address is None or args.process_id is None:
            raise SystemExit(
                "--num_processes requires --coordinator_address and "
                "--process_id"
            )
        from fastedit_tpu.parallel import multihost

        multihost.initialize(
            args.coordinator_address, args.num_processes, args.process_id
        )
        args.data_parallel = True
        print(
            f"[multi-host] process {args.process_id}/{args.num_processes} "
            f"joined {args.coordinator_address}"
        )

    suffix = harness.model_suffix(args.model, args.full_precision)
    edited_dir = os.path.join(args.output_dir, "batch", "edited", suffix)
    comparisons_dir = os.path.join(args.output_dir, "batch", "comparisons", suffix)
    os.makedirs(edited_dir, exist_ok=True)
    if args.save_comparisons:
        os.makedirs(comparisons_dir, exist_ok=True)

    print(f"\n[1/3] Loading mapping file from {args.mapping_file}")
    mapping = harness.load_mapping(args.mapping_file)
    print(f"      Total entries in mapping file: {len(mapping)}")

    selected = harness.select_entries(
        mapping, args.image_ids, args.editing_types, args.num_images
    )
    print(f"\n[2/3] Selected {len(selected)} images")
    if not selected:
        print("      No images selected. Exiting.")
        return 0

    print(f"\n[3/3] Initializing FastEditor ({suffix})...")
    editor = FastEditor(
        model_name=args.model,
        use_full_precision=args.full_precision,
        use_full_controlnet=args.full_controlnet,
        checkpoint_dir=args.checkpoint_dir,
    )
    mem = editor.get_memory_usage()
    print(
        f"      Device memory: {mem['allocated_gb']:.2f}GB in use / "
        f"{mem['reserved_gb']:.2f}GB limit"
    )
    print(
        f"      Parameters: steps={args.steps}, guidance={args.guidance}, "
        f"control_scale={args.control_scale}, strength={args.strength}"
    )

    # Record the fully-resolved run config next to the outputs (the reference
    # lost this information; see SURVEY.md §5 config row).
    with open(os.path.join(edited_dir, "run_config.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    if args.model_parallel and args.model_parallel > 1:
        args.data_parallel = True
    if args.data_parallel:
        from fastedit_tpu.parallel.batch import run_batch_data_parallel

        return run_batch_data_parallel(args, editor, selected, edited_dir)

    processed = skipped = failed = 0
    t_sweep = time.time()
    # Lag-1 software pipeline (same shape as parallel/batch.py): image i's
    # device->host readback streams while image i+1 loads and computes.
    pending = None  # (image_id, rel_path, source_img, output_path, prompt, handle)

    def finalize(p):
        nonlocal processed, failed
        image_id, rel_path, source_img, output_path, prompt, handle = p
        try:
            edited_img = handle.result()[0]
            edited_img.save(output_path)
            processed += 1
        except Exception as e:  # keep the sweep alive (reference behavior)
            print(f"\n      Error processing {image_id} ({type(e).__name__}): {e}")
            failed += 1
            return
        if args.save_comparisons:
            # A comparison-plot failure must not mark the already-saved
            # edited image as failed (processed+failed would overcount).
            try:
                cmp_path = os.path.join(
                    comparisons_dir, rel_path.replace(".jpg", ".png")
                )
                os.makedirs(os.path.dirname(cmp_path), exist_ok=True)
                harness.save_comparison(
                    cmp_path, source_img, edited_img, args.model, prompt
                )
            except Exception as e:
                print(f"\n      Error saving comparison for {image_id} "
                      f"({type(e).__name__}): {e}")

    for image_id, entry in tqdm(selected, desc="Editing"):
        try:
            source_path = harness.safe_join(args.source_dir, entry["image_path"])
            output_path = os.path.join(edited_dir, entry["image_path"])
            if args.skip_existing and os.path.exists(output_path):
                skipped += 1
                continue
            if not os.path.exists(source_path):
                failed += 1
                continue
            prompt = entry.get("editing_prompt", "")
            if not prompt:
                failed += 1
                continue
            os.makedirs(os.path.dirname(output_path), exist_ok=True)
            source_img = Image.open(source_path).convert("RGB")

            handle = editor.edit_batch_async(
                [source_img],
                [prompt],
                negative_prompt=args.negative_prompt,
                strength=args.strength,
                num_inference_steps=args.steps,
                guidance_scale=args.guidance,
                controlnet_conditioning_scale=args.control_scale,
                canny_low_threshold=args.canny_low,
                canny_high_threshold=args.canny_high,
                seed=args.seed,
            )
        except ValueError as e:
            print(f"\n      Invalid path for {image_id}: {e}")
            failed += 1
            continue
        except FileNotFoundError as e:
            print(f"\n      File not found for {image_id}: {e}")
            failed += 1
            continue
        except Exception as e:
            print(f"\n      Error dispatching {image_id} ({type(e).__name__}): {e}")
            failed += 1
            continue
        if pending is not None:
            finalize(pending)
        pending = (
            image_id, entry["image_path"], source_img, output_path, prompt, handle
        )
    if pending is not None:
        finalize(pending)
    total_time = time.time() - t_sweep

    print(f"\n{'='*60}\nBATCH PROCESSING SUMMARY\n{'='*60}")
    print(f"\nProcessed:  {processed} images")
    print(f"Skipped:    {skipped} images")
    print(f"Failed:     {failed} images")
    if processed:
        print(f"\nAverage time per image: {total_time / processed:.2f}s "
              f"(pipelined load/edit/readback, amortized)")
        print(f"Total time: {total_time:.2f}s ({total_time / 60:.1f} minutes)")
    print(f"\nOutputs saved to:\n  - Edited images: {edited_dir}")
    if args.save_comparisons:
        print(f"  - Comparisons: {comparisons_dir}")
    print(f"{'='*60}")
    print("\nDone! Next steps:")
    print(f"  python evaluate.py --outputs_dir {edited_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
