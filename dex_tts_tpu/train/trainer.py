"""Training engine: jitted train/valid steps, EMA, checkpoints, epoch loop.

Capability equivalent of reference: DEX-TTS/src/train.py:28-214 — Adam +
grad clip, EMA weights, best-train/best-val/every-N/last checkpoints,
plaintext epoch log — re-designed around a pure jitted step over an
explicit TrainState. AMP GradScaler has no analogue here: bf16 on TPU
needs no loss scaling.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dex_tts_tpu.train.checkpoint import CheckpointManager
from dex_tts_tpu.train.state import TrainState

BATCH_KEYS = (
    "x",
    "x_lengths",
    "y",
    "y_lengths",
    "spk",
    "ref",
    "ref_lengths",
    "sty",
    "sty_lengths",
    "lf0",
    "lf0_lengths",
)


def _model_inputs(model, batch: dict) -> dict:
    keys = set(BATCH_KEYS)
    if not getattr(model, "use_style", False):
        keys -= {"ref", "ref_lengths", "sty", "sty_lengths", "lf0", "lf0_lengths"}
    if getattr(model, "n_spks", 1) <= 1:
        keys -= {"spk"}
    return {k: v for k, v in batch.items() if k in keys}


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    out_size: int | None = None,
    ema_decay: float = 0.9999,
    mask_ratio: float = 0.0,
    accum_steps: int = 1,
):
    """Build the pure train step: (state, batch) → (state, metrics).

    The loss optimized is the raw sum of the per-term losses
    (reference: DEX-TTS/src/train.py:131-137,198 — the reference *displays*
    the mean but steps on the sum).

    accum_steps > 1 splits the batch into that many micro-batches folded
    sequentially in a lax.scan (gradients averaged, BatchNorm/VQ-EMA stats
    threaded through), trading wall time for activation memory — one
    optimizer update either way.
    """

    def _loss_and_grad(params, batch_stats, vq_stats, inputs, k_loss, k_drop):
        def loss_fn(params):
            variables = {
                "params": params,
                "batch_stats": batch_stats,
                "vq_stats": vq_stats,
            }
            losses, updates = model.apply(
                variables,
                k_loss,
                train=True,
                out_size=out_size,
                mask_ratio=mask_ratio,
                method=type(model).compute_loss,
                rngs={"dropout": k_drop},
                mutable=["batch_stats", "vq_stats"],
                **inputs,
            )
            total = sum(losses.values())
            return total, (losses, updates)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def train_step(state: TrainState, batch: dict):
        rng, k_loss, k_drop = jax.random.split(state.rng, 3)
        inputs = _model_inputs(model, batch)

        if accum_steps == 1:
            (total, (losses, updates)), grads = _loss_and_grad(
                state.params, state.batch_stats, state.vq_stats, inputs,
                k_loss, k_drop,
            )
        else:
            b = next(iter(inputs.values())).shape[0]
            assert b % accum_steps == 0, (b, accum_steps)
            micro = {
                k: v.reshape(accum_steps, b // accum_steps, *v.shape[1:])
                for k, v in inputs.items()
            }
            keys = jax.random.split(k_loss, accum_steps)
            dkeys = jax.random.split(k_drop, accum_steps)

            def body(carry, xs):
                grad_sum, loss_sum, bstats, vstats = carry
                mb, kl, kd = xs
                (total, (losses, updates)), grads = _loss_and_grad(
                    state.params, bstats, vstats, mb, kl, kd
                )
                grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
                loss_sum = {k: loss_sum[k] + losses[k] for k in losses}
                return (
                    grad_sum,
                    loss_sum,
                    updates.get("batch_stats", bstats),
                    updates.get("vq_stats", vstats),
                ), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            first_mb = {k: v[0] for k, v in micro.items()}
            loss_shapes = jax.eval_shape(
                lambda: _loss_and_grad(
                    state.params, state.batch_stats, state.vq_stats,
                    first_mb, keys[0], dkeys[0],
                )[0][1][0]
            )
            zero_losses = {
                k: jnp.zeros(s.shape, s.dtype) for k, s in loss_shapes.items()
            }
            (grads, losses, bstats, vstats), _ = jax.lax.scan(
                body,
                (zero_grads, zero_losses, state.batch_stats, state.vq_stats),
                (micro, keys, dkeys),
            )
            inv = 1.0 / accum_steps
            grads = jax.tree.map(lambda g: g * inv, grads)
            losses = {k: v * inv for k, v in losses.items()}
            total = sum(losses.values())
            updates = {"batch_stats": bstats, "vq_stats": vstats}

        param_updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, param_updates)
        ema_params = optax.incremental_update(
            params, state.ema_params, step_size=1.0 - ema_decay
        )
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            vq_stats=updates.get("vq_stats", state.vq_stats),
            rng=rng,
        )
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_valid_step(model, out_size: int | None = None):
    """Validation losses (no dropout, no state update, fixed sub-rng)."""

    def valid_step(state: TrainState, batch: dict, key: jax.Array):
        inputs = _model_inputs(model, batch)
        variables = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "vq_stats": state.vq_stats,
        }
        losses = model.apply(
            variables,
            key,
            train=False,
            out_size=out_size,
            method=type(model).compute_loss,
            **inputs,
        )
        losses["total_loss"] = sum(losses.values())
        return losses

    return valid_step


class Trainer:
    """Epoch loop with logging + checkpoint policies.

    Checkpoints (reference: DEX-TTS/src/train.py:139-150): best-train,
    best-val, every ``save_epoch``, and last (with optimizer for resume).
    """

    def __init__(
        self,
        model,
        state: TrainState,
        tx: optax.GradientTransformation,
        exp_dir: str,
        out_size: int | None = None,
        ema_decay: float = 0.9999,
        mask_ratio: float = 0.0,
        accum_steps: int = 1,
        save_epoch: int = 200,
        syn_every: int = 0,
        syn_fn: Callable | None = None,
        jit: bool = True,
        donate: bool = True,
        mesh=None,
        preemption=None,
        async_ckpt: bool = False,
    ):
        self.model = model
        self.state = state
        self.mesh = mesh
        # PreemptionGuard (train/preemption.py): polled between steps;
        # fit() checkpoints and returns early when it trips
        self.preemption = preemption
        if mesh is not None:
            from dex_tts_tpu.parallel import replicate_state

            self.state = replicate_state(state, mesh)
        self.exp_dir = exp_dir
        self.save_epoch = save_epoch
        self.syn_every = syn_every
        self.syn_fn = syn_fn
        os.makedirs(exp_dir, exist_ok=True)
        # async_ckpt: epoch-boundary saves return after the device→host
        # copy and persist in the background (train/checkpoint.py); fit()
        # waits before returning so nothing is lost on exit
        self.ckpt = CheckpointManager(
            os.path.join(exp_dir, "ckpt"), async_save=async_ckpt
        )

        step = make_train_step(
            model, tx, out_size, ema_decay, mask_ratio, accum_steps
        )
        vstep = make_valid_step(model, out_size)

        # fused step+metric-accumulation variants: metric sums live on
        # device across the epoch so the loop never blocks on a host
        # round-trip per batch (a blocking dispatch costs ~30 ms on the
        # remote-TPU link; the reference loop pays .item() per term,
        # DEX-TTS/src/train.py:180-214)
        raw_step, raw_vstep = step, vstep
        if mesh is not None:
            # dp-sharded batch, replicated state: XLA derives the gradient
            # all-reduce over ICI (see parallel/mesh.py)
            from jax.sharding import NamedSharding, PartitionSpec as P

            replicated = NamedSharding(mesh, P())

            def _constrain(batch):
                return jax.lax.with_sharding_constraint(
                    batch,
                    {
                        k: NamedSharding(
                            mesh, P("dp", *([None] * (np.ndim(v) - 1)))
                        )
                        for k, v in batch.items()
                    },
                )

            def step_acc(state, batch, sums):
                new_state, metrics = raw_step(state, _constrain(batch))
                new_state = jax.lax.with_sharding_constraint(
                    new_state, replicated
                )
                return new_state, {k: sums[k] + metrics[k] for k in metrics}

            def vstep_acc(state, batch, key, sums):
                metrics = raw_vstep(state, _constrain(batch), key)
                return {k: sums[k] + metrics[k] for k in metrics}

        else:

            def step_acc(state, batch, sums):
                new_state, metrics = raw_step(state, batch)
                return new_state, {k: sums[k] + metrics[k] for k in metrics}

            def vstep_acc(state, batch, key, sums):
                metrics = raw_vstep(state, batch, key)
                return {k: sums[k] + metrics[k] for k in metrics}

        if jit:
            step = jax.jit(step, donate_argnums=(0,) if donate else ())
            vstep = jax.jit(vstep)
            step_acc = jax.jit(
                step_acc, donate_argnums=(0, 2) if donate else (2,)
            )
            vstep_acc = jax.jit(vstep_acc, donate_argnums=(3,))
        self.train_step = step
        self.valid_step = vstep
        self._train_step_acc = step_acc
        self._valid_step_acc = vstep_acc

        self.best_train = float("inf")
        self.best_val = float("inf")
        self.log_path = os.path.join(exp_dir, "log.txt")

    def log(self, msg: str):
        print(msg, flush=True)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")

    def _zero_sums(self, batch: dict, train: bool, key=None) -> dict:
        """Zero metric accumulators, keyed via eval_shape (no compile)."""
        if train:
            _, m = jax.eval_shape(self.train_step, self.state, batch)
        else:
            m = jax.eval_shape(self.valid_step, self.state, batch, key)
        return {k: jnp.zeros(s.shape, s.dtype) for k, s in m.items()}

    def _put_batch(self, batch: dict) -> dict:
        """Place the (host) batch: dp-sharded over the mesh when present;
        multi-host processes contribute their local shard."""
        if self.mesh is None:
            return batch
        from dex_tts_tpu.parallel import assemble_global_batch, shard_batch

        if jax.process_count() > 1:
            return assemble_global_batch(batch, self.mesh)
        return shard_batch(batch, self.mesh)

    def run_epoch(self, loader: Iterable[dict], train: bool = True) -> dict:
        sums, count = None, 0
        key = jax.random.PRNGKey(int(self.state.step))
        for batch in loader:
            if self.preemption is not None and self.preemption.triggered:
                break
            batch = {k: v for k, v in batch.items() if not isinstance(v, str)}
            batch = self._put_batch(batch)
            if train:
                if sums is None:
                    sums = self._zero_sums(batch, train=True)
                self.state, sums = self._train_step_acc(self.state, batch, sums)
            else:
                key, sub = jax.random.split(key)
                if sums is None:
                    sums = self._zero_sums(batch, train=False, key=sub)
                sums = self._valid_step_acc(self.state, batch, sub, sums)
            count += 1
        if sums is None:
            return {}
        # single host sync for the whole epoch
        host = jax.device_get(sums)
        return {k: float(v) / max(count, 1) for k, v in host.items()}

    def fit(
        self,
        train_loader_fn: Callable[[], Iterable[dict]],
        valid_loader_fn: Callable[[], Iterable[dict]] | None = None,
        epochs: int = 1,
        start_epoch: int = 0,
    ):
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            train_metrics = self.run_epoch(train_loader_fn(), train=True)
            if self.preemption is not None and self.preemption.triggered:
                # grace-window checkpoint: resume continues from here
                self.ckpt.save_many(self.state, ["last", "preempt"])
                self.ckpt.wait()  # must be durable before the grace window ends
                self.log(
                    f"preempted during epoch {epoch + 1}: saved "
                    "last/preempt checkpoints, exiting"
                )
                return self.state
            line = f"epoch {epoch + 1} | " + " ".join(
                f"{k}={v:.4f}" for k, v in sorted(train_metrics.items())
            )
            # all boundary tags share one payload (validation does not
            # mutate state) → one orbax write + hard-linked tag copies,
            # so the whole group overlaps training under async_ckpt
            tags = []
            if valid_loader_fn is not None:
                val_metrics = self.run_epoch(valid_loader_fn(), train=False)
                line += " | val " + " ".join(
                    f"{k}={v:.4f}" for k, v in sorted(val_metrics.items())
                )
                if val_metrics.get("total_loss", np.inf) < self.best_val:
                    self.best_val = val_metrics["total_loss"]
                    tags.append("best-val")
            line += f" | {time.time() - t0:.1f}s"
            self.log(line)

            if train_metrics.get("total_loss", np.inf) < self.best_train:
                self.best_train = train_metrics["total_loss"]
                tags.append("best-train")
            if self.save_epoch and (epoch + 1) % self.save_epoch == 0:
                tags.append(f"epoch-{epoch + 1}")
            tags.append("last")
            self.ckpt.save_many(self.state, tags)

            if self.syn_every and self.syn_fn and (epoch + 1) % self.syn_every == 0:
                self.syn_fn(self.state, epoch + 1)
        self.ckpt.wait()  # async saves must be durable before we return
        return self.state
