"""Device mesh + data-parallel training over ICI/DCN.

The reference has no distributed layer at all (single cuda:0 device, no
torch.distributed anywhere — SURVEY §2.2; multi-GPU is an unchecked README
ToDo). This module adds the TPU-native one: a `jax.sharding.Mesh` whose
'dp' axis shards the batch across chips; parameters and optimizer state are
replicated, and XLA inserts the psum gradient all-reduce over ICI when the
jitted step consumes dp-sharded inputs with replicated outputs.

At DEX-TTS scale (~50 M params) pure DP is the right parallelism — TP/PP
would shard layers far below MXU-efficient sizes — but the mesh keeps a
'tp' axis available so model-axis rules can be added without API changes.

Multi-host: call jax.distributed.initialize() before make_mesh(); each host
feeds its local batch shard via jax.make_array_from_process_local_data.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    axis_names: Sequence[str] = ("dp", "tp"),
    tp_size: int = 1,
) -> Mesh:
    """Mesh over all (or the first n) devices: ('dp', 'tp') with tp=1 by
    default. jax reorders devices so 'dp' rides ICI within a slice."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % tp_size == 0, (n, tp_size)
    grid = np.asarray(devices).reshape(n // tp_size, tp_size)
    return Mesh(grid, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place every batch array with its leading axis sharded over 'dp'."""
    out = {}
    for k, v in batch.items():
        spec = P("dp", *([None] * (np.ndim(v) - 1)))
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate_state(state, mesh: Mesh):
    """Replicate the TrainState on every device of the mesh."""
    replicated = NamedSharding(mesh, P())
    return jax.device_put(state, replicated)


def make_parallel_train_step(
    train_step, mesh: Mesh, donate: bool = True, state_shardings=None
):
    """jit the pure train step with dp-sharded batch inputs: XLA derives
    the gradient all-reduce automatically.

    state_shardings: optional per-leaf NamedSharding pytree for the
    TrainState (see parallel.tp.tp_state_shardings) — the new state is
    constrained back to the same placement so params/EMA/moments stay
    tp-sharded step over step. Default: fully replicated state (pure DP).
    """
    if state_shardings is None:
        state_shardings = NamedSharding(mesh, P())

    def batch_spec(batch):
        return {
            k: NamedSharding(mesh, P("dp", *([None] * (np.ndim(v) - 1))))
            for k, v in batch.items()
        }

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state, batch):
        batch = jax.lax.with_sharding_constraint(batch, batch_spec(batch))
        new_state, metrics = train_step(state, batch)
        new_state = jax.lax.with_sharding_constraint(
            new_state, state_shardings
        )
        return new_state, metrics

    return step
