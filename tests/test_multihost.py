"""Multi-host DP: the edit path over a real 2-process JAX cluster.

The unit-test mesh (8 virtual devices, one process) can't exercise what
multi-host adds: distributed service init, cross-process device discovery,
``device_put`` onto shardings with non-addressable devices, multi-controller
jit dispatch, and per-host readback of only the locally-owned output rows.
``tools/multihost_dryrun.py`` stands all of that up on CPU with gloo
collectives (the DCN-analog transport; on TPU pods the same code rides ICI
within a slice) — see SURVEY.md §2.4 / parallel/mesh.py.

Subprocess-launched (a distributed cluster can't be stood up inside the
test process: the 8-device virtual backend is already initialized), and
slow-gated: two fresh processes each compile the tiny edit program.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_multihost_sweep_writes_every_row(tmp_path):
    """run_batch.py as a 2-process cluster: the global batch is sharded over
    both hosts and each saves exactly its own rows — together the sweep
    covers every image, composing with the filesystem-keyed resume."""
    demo = tmp_path / "demo"
    out = tmp_path / "out"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["FASTEDIT_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    subprocess.run(
        [sys.executable, "-m", "fastedit_tpu.tools.make_demo_data",
         "--out", str(demo), "--n", "4", "--size", "64"],
        env=env, cwd=REPO, check=True, timeout=300,
    )
    # Pre-existing output: --skip_existing decisions are filesystem checks
    # that must be agreed globally (allgather) before chunking — this also
    # exercises that path (here the shared fs makes both hosts' bits equal;
    # the agreement collective still runs).
    import json

    mapping = json.loads((demo / "mapping_file.json").read_text())
    first = next(iter(mapping.values()))["image_path"]
    pre = out / "batch" / "edited" / "tiny_fp16" / first
    pre.parent.mkdir(parents=True, exist_ok=True)
    pre.write_bytes(b"placeholder")
    common = [
        sys.executable, os.path.join(REPO, "run_batch.py"),
        "--mapping_file", str(demo / "mapping_file.json"),
        "--source_dir", str(demo / "annotation_images"),
        "--model", "tiny", "--output_dir", str(out), "--seed", "7",
        "--skip_existing",
        "--coordinator_address", "localhost:12466",
        "--num_processes", "2",
    ]
    procs = [
        subprocess.Popen(
            common + ["--process_id", str(rank)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=500)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    edited = sorted((out / "batch" / "edited" / "tiny_fp16").rglob("*.jpg"))
    assert len(edited) == 4, edited  # 3 fresh + the placeholder
    for o in outs:
        assert "Skipped:    1 images" in o, o[-2000:]
    # 3 remaining rows, one padded chunk of 4: sharded 2/2 across the hosts,
    # the padding row is dropped at save time -> 2 + 1 saved.
    assert sorted(
        int(o.split("Processed:  ")[1].split(" ")[0]) for o in outs
    ) == [1, 2], outs


@pytest.mark.slow
def test_multihost_dryrun_dp_cross_host_tp_intra_host():
    """The realistic pod layout: tensor-parallel groups inside each host
    (collectives on ICI), data parallelism across hosts (DCN)."""
    env = dict(os.environ)
    # The workers re-derive their own device counts; drop the test
    # harness's 8-device flag so it doesn't leak into them.
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "multihost_dryrun.py"),
            "--processes",
            "2",
            "--local_devices",
            "2",
            "--model_parallel",
            "2",
            "--port",
            "12455",
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]
    assert (
        "[multihost_dryrun] OK: 2 processes x 2 devices "
        "(tensor-parallel x2)" in out
    )
    assert "rank 0: rows [0] match" in out
    assert "rank 1: rows [1] match" in out
