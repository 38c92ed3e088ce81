from fall_multimodal_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharded,
    initialize_distributed,
    make_mesh,
    make_parallel_eval_epoch,
    make_parallel_train_epoch,
    make_parallel_train_step,
    replicate_data,
    replicate_state,
    replicated,
    shard_data,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharded",
    "initialize_distributed",
    "make_mesh",
    "make_parallel_eval_epoch",
    "make_parallel_train_epoch",
    "make_parallel_train_step",
    "replicate_data",
    "replicate_state",
    "replicated",
    "shard_data",
]
