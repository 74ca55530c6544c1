"""Tensor parallelism over the reserved ``model`` mesh axis.

SURVEY.md §2.4 reserved the axis ("design the mesh axis naming so TP
sharding rules can be added without API change") because the bf16 inference
models fit one chip.  The *fp32* quality-mode configs do not: the reference
measures SDXL fp32 at 22.7 GB (README.md:53-58, BASELINE.md memory table) —
over a 16 GB v5e chip's HBM.  TP=2 makes the reference's two fp32 benchmark
configs runnable per pair of chips, batch-DP across the rest of the slice.

The rules are the standard Megatron split for the transformer blocks, which
hold the bulk of the UNet/ControlNet parameters:

  * attention ``to_q/to_k/to_v``: output (head) dim sharded — each device
    computes its heads; the attention itself is head-local.
  * attention ``to_out``: input dim sharded — partial products
    all-reduced by XLA at the residual add.
  * GEGLU ``net_0_proj``: hidden dim sharded (value|gate halves land on
    shard boundaries at tp=2).
  * ``net_2``: input (hidden) dim sharded, all-reduce after.
  * everything else (convs, norms, embeddings, biases of row-parallel
    layers): replicated.

Nothing in the model code changes: the specs are applied to the param
*arrays* (``device_put``) and GSPMD propagates them through the jitted
program, inserting the all-reduces where the math needs them — the
TPU-native replacement for hand-written tensor-parallel layers.

Pallas caveat: custom kernels are opaque to GSPMD, so under TP the
flash-attention / fused-conv kernels would force per-call operand
all-gathers.  ``FastEditor.enable_data_parallel(model_parallel>1)``
therefore pins the XLA paths (dot+softmax attention partitions on the head
axis natively).  TP is a memory feature for the fp32 configs; the bf16
speed path stays single-chip Pallas.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS, Mesh

# Param (sub)module names whose LAST dim is sharded over `model`
# (column-parallel: kernels and their biases).
_COL_PARALLEL = ("to_q", "to_k", "to_v", "net_0_proj")
# Names whose kernel is sharded on dim -2 (row-parallel: partial sums
# all-reduced after); their biases stay replicated.
_ROW_PARALLEL = ("to_out", "net_2")


def tp_spec(path, leaf, tp: int) -> P:
    """PartitionSpec for one param leaf (rank-aware: scanned transformer
    stacks carry a leading depth dim)."""
    names = [p.key for p in path if hasattr(p, "key")]
    if len(names) >= 2:
        mod, leafname = names[-2], names[-1]
        r = leaf.ndim
        if mod in _COL_PARALLEL and leaf.shape[-1] % tp == 0:
            return P(*([None] * (r - 1)), MODEL_AXIS)
        if (
            mod in _ROW_PARALLEL
            and leafname == "kernel"
            and r >= 2
            and leaf.shape[-2] % tp == 0
        ):
            return P(*([None] * (r - 2)), MODEL_AXIS, None)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param tree with the TP rules above (replicated over ``data``,
    transformer matmuls split over ``model``)."""
    tp = int(mesh.shape[MODEL_AXIS])
    specs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, tp_spec(path, leaf, tp)),
        params,
    )
    return jax.tree.map(jax.device_put, params, specs)
