"""Multi-host DP dry run: the full edit path over a 2-process JAX cluster.

The reference is strictly single-process/single-GPU (run_batch.py:176); this
framework's DP design is "weights replicated, batch sharded" over a mesh that
is *meant* to span hosts via ``jax.distributed.initialize()`` + DCN
(SURVEY.md §2.4, parallel/mesh.py).  No multi-host TPU hardware exists in
this environment, but JAX's multi-controller runtime is backend-agnostic:
this tool stands up a real N-process cluster on CPU (gloo collectives,
``--xla_force_host_platform_device_count`` local devices per process), runs
``FastEditor.edit_batch`` over the *global* mesh, and checks each process's
addressable output rows against a single-process recompute of the same
images.  That exercises everything multi-host DP adds over the single-host
virtual mesh the unit tests use:

  * distributed service init + cross-process device discovery,
  * ``device_put`` of host data onto shardings spanning non-addressable
    devices (weights replicated globally, batch rows placed per host),
  * multi-controller jit dispatch of the fused edit program,
  * per-host readback of only the locally-owned output rows
    (``PendingEdit.local_result`` — the multi-host form of the sweep's
    per-shard ``--skip_existing`` resume).

Usage (parent spawns the workers, workers re-enter this file):
    python tools/multihost_dryrun.py [--processes 2] [--local_devices 4]
                                     [--batch 8] [--port 12402]

Exit 0 + a final ``[multihost_dryrun] OK`` line on success.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

_RANK_ENV = "FASTEDIT_MH_RANK"


def _parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--processes", type=int, default=2)
    p.add_argument("--local_devices", type=int, default=4)
    p.add_argument("--model_parallel", type=int, default=1,
                   help="tensor-parallel group size; must divide "
                        "local_devices so TP collectives stay intra-host "
                        "(ICI), DP rides the cross-host axis (DCN)")
    p.add_argument("--batch", type=int, default=None,
                   help="global batch (default: one image per data group)")
    p.add_argument("--port", type=int, default=12402)
    p.add_argument("--timeout", type=float, default=600.0)
    return p.parse_args(argv)


def _spawn_parent(args) -> int:
    """Launch the worker processes; the parent never imports jax (with the
    remote-TPU relay down, backend init in the parent could hang)."""
    import re

    here = os.path.abspath(__file__)
    env_base = dict(os.environ)
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "",
        env_base.get("XLA_FLAGS", ""),
    )
    procs = []
    for rank in range(args.processes):
        env = dict(env_base)
        env[_RANK_ENV] = str(rank)
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.local_devices}"
        ).strip()
        procs.append(
            subprocess.Popen(
                [sys.executable, here] + sys.argv[1:],
                env=env,
                cwd=os.path.dirname(os.path.dirname(here)),
            )
        )
    rcs = []
    try:
        for p in procs:
            rcs.append(p.wait(timeout=args.timeout))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        print("[multihost_dryrun] FAILED: worker timeout", flush=True)
        return 1
    if any(rcs):
        print(f"[multihost_dryrun] FAILED: worker rcs {rcs}", flush=True)
        return 1
    tp = f" (tensor-parallel x{args.model_parallel})" if (
        args.model_parallel > 1
    ) else ""
    print(
        f"[multihost_dryrun] OK: {args.processes} processes x "
        f"{args.local_devices} devices{tp}, full edit_batch over the "
        f"global mesh",
        flush=True,
    )
    return 0


def _run_worker(args, rank: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    # Must flip the platform via config BEFORE backend init: the image's
    # sitecustomize force-registers the remote-TPU backend and the env var
    # override loses to it (same dance as __graft_entry__'s dryrun child).
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{args.port}",
        num_processes=args.processes,
        process_id=rank,
    )

    import jax.numpy as jnp
    import numpy as np

    from fastedit_tpu import FastEditor
    from fastedit_tpu.parallel.mesh import make_mesh

    n_global = args.processes * args.local_devices
    assert len(jax.devices()) == n_global, (
        f"cluster exposes {len(jax.devices())} devices, expected {n_global}"
    )
    tp = args.model_parallel
    assert args.local_devices % tp == 0, (
        "model groups must not straddle hosts"
    )
    batch = args.batch or n_global // tp

    from PIL import Image

    rng = np.random.default_rng(0)  # same seed on every process: the DP
    # contract is identical host inputs per controller (multi-controller
    # jit's "same program, same data" invariant).
    images = [
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB"
        )
        for _ in range(batch)
    ]
    prompts = [f"a photo {i}" for i in range(batch)]

    editor = FastEditor("tiny", dtype=jnp.float32)
    # Single-process reference first (local device 0, no collectives).
    ref = editor.edit_batch(images, prompts, seed=3)

    # Global mesh: devices are ordered by process, so with tp dividing
    # local_devices every model group is intra-host (TP all-reduces ride
    # ICI) and the data axis is what spans hosts (DCN).
    mesh = make_mesh(model_parallel=tp)
    editor.enable_data_parallel(mesh, model_parallel=tp)
    handle = editor.edit_batch_async(images, prompts, seed=3)
    local = handle.local_result()

    expect_rows = batch // args.processes
    assert len(local) == expect_rows, (rank, len(local), expect_rows)
    for row, img in local:
        da = np.asarray(ref[row], dtype=np.int32)
        db = np.asarray(img, dtype=np.int32)
        diff = np.abs(da - db)
        assert float(diff.mean()) < 2.0, (
            f"rank {rank} row {row}: mean diff {diff.mean():.2f}"
        )
    rows = [r for r, _ in local]
    print(
        f"[multihost_dryrun] rank {rank}: rows {rows} match the "
        f"single-process reference",
        flush=True,
    )


def main(argv=None) -> int:
    args = _parse_args(argv)
    rank = os.environ.get(_RANK_ENV)
    if rank is None:
        return _spawn_parent(args)
    _run_worker(args, int(rank))
    return 0


if __name__ == "__main__":
    sys.exit(main())
