"""Multi-host runtime: jax.distributed initialization + per-process batch
assembly.

The reference is single-device (cuda:0, no torch.distributed — SURVEY
§2.2); this is the TPU-native multi-host layer: one Python process per
host, `jax.distributed.initialize` to form the global runtime, each
process feeding its local shard of every global batch via
`jax.make_array_from_process_local_data`, with `BucketBatcher`'s
process_count/process_index handling the data split (globally consistent
bucket shapes from header-only length reads).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the multi-host runtime. Must run before first backend use.

    Single-process runs (JAX_PROCESS_COUNT unset/1 and no explicit args) are
    a no-op returning False. On TPU pods `jax.distributed.initialize()`
    autodetects all arguments from the environment; explicit args override.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_PROCESS_COUNT", "1"))
    explicit = coordinator_address is not None or process_id is not None
    if num_processes <= 1 and not explicit:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if process_id is not None:
        kwargs["process_id"] = process_id
    if num_processes > 1:
        kwargs["num_processes"] = num_processes
    jax.distributed.initialize(**kwargs)
    return True


def assemble_global_batch(local_batch: dict, mesh: Mesh) -> dict:
    """Per-process local batch shard → global dp-sharded jax.Arrays.

    Every process passes its own (batch_size // process_count)-sized shard
    with identical feature shapes; the result is the global batch laid out
    over the mesh's 'dp' axis without any cross-host data movement.
    """
    out = {}
    for k, v in local_batch.items():
        v = np.asarray(v)
        spec = P("dp", *([None] * (v.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
