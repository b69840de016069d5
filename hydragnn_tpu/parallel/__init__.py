from hydragnn_tpu.parallel.dp import (
    make_mesh,
    stack_batches,
    make_dp_train_step,
    shard_stacked_batch,
)

__all__ = [
    "make_mesh",
    "stack_batches",
    "make_dp_train_step",
    "shard_stacked_batch",
]
