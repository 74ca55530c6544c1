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
def test_multihost_dryrun_two_processes():
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
            "--batch",
            "4",
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
    assert "[multihost_dryrun] OK: 2 processes x 2 devices" in out
    assert "rank 0: rows [0, 1] match" in out
    assert "rank 1: rows [2, 3] match" in out
