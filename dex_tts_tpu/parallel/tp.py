"""Tensor-parallel parameter sharding over the mesh's 'tp' axis.

The reference carries a vestigial, never-used ``tensor_parallel`` flag
threaded through its RetNet constructors (reference:
GeDEX-TTS/model/retnet.py:10,24, model/retention.py:190,
model/text_encoder.py:124). This module is the working TPU-native version:
Megatron-style column/row partition rules for the matmul-heavy submodules
(RetNet q/k/v/g + GLU FFN, DiT attention qkv/proj + MLP), expressed as
`PartitionSpec`s on the parameter pytree — XLA SPMD propagates them through
the jitted train step and inserts the all-reduces over ICI.

At DEX-TTS scale (~50 M params) pure DP remains the right default (SURVEY
§2.2: per-device matmuls would drop below MXU-efficient sizes); TP is an
opt-in scaling axis, validated for numerical equivalence against the
single-device step on the virtual mesh (tests/test_train.py) and exercised
by `__graft_entry__.dryrun_multichip`.

Usage::

    mesh = make_mesh(8, tp_size=2)                  # dp=4 x tp=2
    shardings = tp_state_shardings(state, mesh)
    pstate = jax.device_put(state, shardings)
    step = make_parallel_train_step(
        make_train_step(model, tx), mesh, state_shardings=shardings
    )
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# kernel (in, out) sharded on the output axis; 1-D bias sharded alike
COLUMN_RULES = (
    "retention/q_proj",
    "retention/k_proj",
    "retention/v_proj",
    "retention/g_proj",
    "ffn/gate",
    "ffn/fc1",
    "attn/qkv",
    "mlp_fc1",
)
# kernel (in, out) sharded on the input axis; bias stays replicated
ROW_RULES = (
    "retention/out_proj",
    "ffn/fc2",
    "attn/proj",
    "mlp_fc2",
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:  # pragma: no cover - future key kinds
            parts.append(str(k))
    return "/".join(parts)


def partition_spec(path_str: str, leaf, tp_size: int) -> P:
    """PartitionSpec for one state leaf. Non-matching leaves (convs, norms,
    embeddings, optimizer scalars) replicate; matching leaves whose sharded
    dim is not divisible by tp_size also replicate (never a hard error, so
    odd widths degrade gracefully)."""
    ndim = getattr(leaf, "ndim", None)
    shape = getattr(leaf, "shape", ())
    if ndim not in (1, 2):
        return P()
    col = any(r in path_str for r in COLUMN_RULES)
    row = any(r in path_str for r in ROW_RULES)
    if ndim == 2:
        if col and shape[1] % tp_size == 0:
            return P(None, "tp")
        if row and shape[0] % tp_size == 0:
            return P("tp", None)
    elif col and shape[0] % tp_size == 0:  # column-parallel bias
        return P("tp")
    return P()


def tp_state_shardings(state, mesh: Mesh):
    """Per-leaf NamedSharding pytree for any param-bearing pytree: a
    TrainState (params, EMA and the Adam mu/nu moments all contain the
    param subtree, so the same path rules shard them identically), or a
    bare flax `variables` dict for serving-time TP (pipeline.Synthesizer).
    Non-matching leaves replicate."""
    tp_size = mesh.shape["tp"]

    def leaf_sharding(path, leaf):
        return NamedSharding(
            mesh, partition_spec(_path_str(path), leaf, tp_size)
        )

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def shard_count(shardings) -> int:
    """Number of actually-sharded leaves (diagnostics/tests)."""
    leaves = jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
    )
    return sum(1 for s in leaves if s.spec != P())
