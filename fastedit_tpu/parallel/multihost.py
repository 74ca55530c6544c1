"""Multi-host (multi-process) cluster support for DP sweeps.

A TPU pod slice runs one controller process per host; JAX stitches them into
a single global device mesh via ``jax.distributed.initialize()`` (DCN for
coordination, ICI for collectives — SURVEY.md §2.4/§5 comm-backend rows).
The same multi-controller runtime works on CPU with gloo collectives, which
is how ``tools/multihost_dryrun.py`` and the tests stand up a real 2-process
cluster without pod hardware.

Sweep semantics under multi-host DP: every process runs the same program
over the same global *work list* (the multi-controller invariant — a
divergent chunk list deadlocks the next global dispatch), and each host
materializes/saves only the output rows it owns
(``PendingEdit.local_result``).  Filesystem-dependent decisions
(``--skip_existing``, missing sources) are therefore agreed globally via a
``process_allgather`` of the per-host bits before chunking; replicated jit
inputs that are randomly drawn (the default seed) are broadcast from
process 0.
"""

from __future__ import annotations

from typing import List

import jax

from .mesh import Mesh


def initialize(
    coordinator_address: str, num_processes: int, process_id: int
) -> None:
    """Join this process to the cluster.  Must run before any device use
    (first jax device touch initializes the backend).  The package import
    has already honored FASTEDIT_PLATFORM, so CPU-simulated clusters work
    the same way the real thing does."""
    jax.distributed.initialize(
        coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def spans_processes(mesh: Mesh) -> bool:
    """True when the mesh includes devices of more than one process."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def local_rows(mesh: Mesh, batch: int) -> List[int]:
    """Global batch-row indices this process owns under ``P('data')``
    sharding (one row per data-axis device; mesh order == shard order)."""
    n = mesh.shape["data"]
    me = jax.process_index()
    rows_per_dev = max(1, batch // n)
    out = []
    for i, dev in enumerate(mesh.devices[:, 0] if mesh.devices.ndim > 1
                            else mesh.devices):
        if dev.process_index == me:
            out.extend(
                r
                for r in range(i * rows_per_dev, (i + 1) * rows_per_dev)
                if r < batch
            )
    return out
