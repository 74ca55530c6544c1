#!/usr/bin/env python
"""Serve the editor over HTTP with dynamic request batching.

Production front-end for online traffic (the CLI counterparts
run_single_image.py / run_batch.py cover offline use, mirroring the
reference's entry points; the reference has no serving story at all —
SURVEY.md §1 L5).  Concurrent requests with identical sampler settings
coalesce into one device batch (fastedit_tpu/serve.py), which sustains
~40% more edits/min/chip than per-request dispatch (bench.py batch-4
numbers vs single-edit latency).

Examples
--------
  # tiny smoke model on CPU (no checkpoint needed), port 8000
  FASTEDIT_PLATFORM=cpu python serve.py --model tiny --warmup

  # production: converted SSD-1B checkpoint on the TPU
  python serve.py --model ssd-1b --checkpoint_dir checkpoints/ssd-1b \
      --port 8000 --max_batch 4 --warmup

  # request
  curl -s localhost:8000/v1/edit -d '{"image": "<base64>", "prompt": "..."}'
"""

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model", default="ssd-1b", help="sdxl | ssd-1b | tiny")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument(
        "--random_weights",
        action="store_true",
        help="full architecture with zero weights (latency/shape work)",
    )
    p.add_argument("--full_precision", action="store_true")
    p.add_argument("--full_controlnet", action="store_true")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=4)
    p.add_argument("--batch_window_ms", type=float, default=10.0)
    p.add_argument("--max_queue", type=int, default=256)
    p.add_argument(
        "--warmup",
        action="store_true",
        help="pre-compile the edit program at every padded batch size "
        "before accepting traffic (first compile is ~20-40 s on TPU)",
    )
    p.add_argument("--request_timeout_s", type=float, default=600.0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from fastedit_tpu import FastEditor
    from fastedit_tpu.serve import EditService, make_http_server

    editor = FastEditor(
        args.model,
        use_full_precision=args.full_precision,
        use_full_controlnet=args.full_controlnet,
        checkpoint_dir=args.checkpoint_dir,
        random_weights=args.random_weights,
    )
    service = EditService(
        editor,
        max_batch=args.max_batch,
        batch_window_ms=args.batch_window_ms,
        max_queue=args.max_queue,
    )
    if args.warmup:
        sizes, b = [], 1
        while b < args.max_batch:
            sizes.append(b)
            b *= 2
        sizes.append(args.max_batch)
        print(f"[serve] warming batch sizes {sizes} ...", flush=True)
        dt = service.warmup(sizes)
        print(f"[serve] warmup done in {dt:.1f}s", flush=True)

    httpd = make_http_server(
        service, args.host, args.port, request_timeout_s=args.request_timeout_s
    )
    host, port = httpd.server_address[:2]
    print(f"[serve] listening on http://{host}:{port}", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        print("[serve] shutting down", flush=True)
        httpd.server_close()
        service.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
