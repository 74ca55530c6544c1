"""Device mesh + sharding rules for data-parallel editing over ICI.

The reference has no distributed code at all (sequential single-GPU loop,
SURVEY.md §2.4); here DP is first-class: a 1-D ``data`` mesh, weights
replicated per chip (they fit HBM comfortably), batch dim sharded.  The
``model`` axis is declared now (size 1) so tensor-parallel sharding rules
can be added later without API changes.

No explicit collectives are needed for inference DP — XLA inserts them from
the NamedShardings.  Multi-host slices initialize via
``jax.distributed.initialize()`` (DCN) before calling ``make_mesh``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
) -> Mesh:
    """1-D data mesh (x optional model axis) over the local devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    assert n % model_parallel == 0
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_params(params, mesh: Mesh):
    return jax.device_put(params, replicated(mesh))


def shard_batch(tree, mesh: Mesh):
    """Place batch-leading arrays with the batch dim sharded over ``data``."""
    return jax.device_put(tree, batch_sharded(mesh))
