from dex_tts_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_train_step,
    replicate_state,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate_state",
    "make_parallel_train_step",
]
