from fastedit_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharded,
    make_mesh,
    replicate_params,
    replicated,
    shard_batch,
)
