from dex_tts_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_train_step,
    replicate_state,
    shard_batch,
)
from dex_tts_tpu.parallel.runtime import assemble_global_batch, initialize
from dex_tts_tpu.parallel.tp import shard_count, tp_state_shardings

__all__ = [
    "assemble_global_batch",
    "initialize",
    "make_mesh",
    "shard_batch",
    "replicate_state",
    "make_parallel_train_step",
    "shard_count",
    "tp_state_shardings",
]
