"""Train state: params + optimizer + EMA + mutable model collections.

Replaces the reference's implicit torch module state (optimizer, AMP
scaler, deepcopied EMA model — reference: DEX-TTS/src/train.py:28-62) with
one explicit pytree the jitted train step maps over. EMA here is a param
pytree, not a module copy; VQ codebooks / BatchNorm stats are carried as
collections.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any
    batch_stats: Any
    vq_stats: Any
    rng: jax.Array


def make_optimizer(lr: float = 1e-4, max_grad: float = 1.0) -> optax.GradientTransformation:
    """Adam(lr) + global-norm clipping.
    reference: DEX-TTS/src/train.py (Adam 1e-4, clip max_norm 1; ESD uses 5
    via config train.max_grad)."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad),
        optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8),
    )


def create_train_state(
    model,
    init_batch: dict,
    seed: int = 100,
    lr: float = 1e-4,
    max_grad: float = 1.0,
    out_size: int | None = None,
) -> tuple[TrainState, optax.GradientTransformation]:
    """Initialize all variables by tracing compute_loss on one batch."""
    k_params, k_drop, k_loss, k_state = jax.random.split(
        jax.random.PRNGKey(seed), 4
    )
    variables = model.init(
        {"params": k_params, "dropout": k_drop},
        k_loss,
        train=False,
        out_size=out_size,
        method=type(model).compute_loss,
        **init_batch,
    )
    params = variables["params"]
    tx = make_optimizer(lr, max_grad)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
        vq_stats=variables.get("vq_stats", {}),
        rng=k_state,
    )
    return state, tx
