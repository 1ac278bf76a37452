"""Monotonic alignment search (MAS), fully on-device.

The reference implements MAS as a Cython/OpenMP CPU kernel and round-trips
GPU→numpy→GPU every training step
(reference: DEX-TTS/model/monotonic_align/core.pyx:9-45,
 DEX-TTS/model/monotonic_align/__init__.py:8-23).

Here the same Viterbi DP runs inside jit as two `lax.scan`s over mel frames:

  forward  — one scan step per frame y updates the whole (B, Tx) value
             column with VPU-vectorized max/adds (the anti-diagonal band is
             enforced with masks rather than loop bounds),
  backtrace — a reverse scan carries the per-item token index and emits
             one-hot path columns.

This keeps alignment on the TPU (no host sync) and is O(Ty) sequential steps
of O(B·Tx) vector work, matching the Cython kernel's recurrence exactly on
all cells a valid path can visit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e9


def maximum_path(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Most-likely monotonic alignment path.

    Args:
      value: (B, Tx, Ty) log-prior scores (higher = better).
      mask:  (B, Tx, Ty) binary attention mask (outer product of the text
             and mel masks).

    Returns:
      (B, Tx, Ty) 0/1 float path, same semantics as the reference wrapper
      (reference: DEX-TTS/model/monotonic_align/__init__.py:8-23).
    """
    b, t_x_max, t_y_max = value.shape
    dtype = value.dtype
    value = value * mask
    t_xs = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)  # (B,)
    t_ys = jnp.sum(mask[:, 0, :], axis=1).astype(jnp.int32)  # (B,)

    x_ids = jnp.arange(t_x_max, dtype=jnp.int32)  # (Tx,)

    # ---- forward DP: scan over frames y ----
    # carry: previous column of accumulated values, (B, Tx)
    def fwd_step(prev, inputs):
        y, col = inputs  # y scalar, col (B, Tx) raw scores at frame y
        # v_cur: stay on the same token (invalid on the diagonal x == y)
        v_cur = jnp.where(x_ids[None, :] == y, _NEG, prev)
        # v_prev: advance from token x-1 (x == 0 starts at 0 iff y == 0)
        shifted = jnp.pad(prev, ((0, 0), (1, 0)), constant_values=_NEG)[:, :-1]
        first = jnp.where(y == 0, jnp.asarray(0.0, dtype), jnp.asarray(_NEG, dtype))
        v_prev = jnp.where(x_ids[None, :] == 0, first, shifted)
        cand = col + jnp.maximum(v_cur, v_prev)
        # valid band: x <= y, x >= t_x + y - t_y, x < t_x, y < t_y
        valid = (
            (x_ids[None, :] <= y)
            & (x_ids[None, :] >= t_xs[:, None] + y - t_ys[:, None])
            & (x_ids[None, :] < t_xs[:, None])
            & (y < t_ys[:, None])
        )
        new = jnp.where(valid, cand, _NEG)
        return new, new

    cols = jnp.moveaxis(value, 2, 0)  # (Ty, B, Tx)
    ys = jnp.arange(t_y_max, dtype=jnp.int32)
    init = jnp.full((b, t_x_max), _NEG, dtype)
    _, acc = jax.lax.scan(fwd_step, init, (ys, cols))  # acc: (Ty, B, Tx)

    # ---- backtrace: reverse scan carrying the current token index ----
    # at step y we need the accumulated column y-1
    acc_prev = jnp.concatenate([jnp.full((1, b, t_x_max), _NEG, dtype), acc[:-1]], 0)
    batch_ids = jnp.arange(b)

    def bwd_step(index, inputs):
        y, col_prev = inputs  # col_prev: accumulated values at frame y-1
        active = y < t_ys  # (B,)
        emit = (x_ids[None, :] == index[:, None]) & active[:, None]
        v_here = col_prev[batch_ids, index]
        v_diag = col_prev[batch_ids, jnp.maximum(index - 1, 0)]
        move = (index != 0) & ((index == y) | (v_here < v_diag))
        new_index = jnp.where(active & move, index - 1, index)
        return new_index, emit

    init_index = t_xs - 1
    _, path_cols = jax.lax.scan(
        bwd_step, init_index, (ys, acc_prev), reverse=True
    )  # (Ty, B, Tx), emitted in forward order
    path = jnp.moveaxis(path_cols, 0, 2).astype(dtype)  # (B, Tx, Ty)
    return path * mask
