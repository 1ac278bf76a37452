"""Random fixed-size segment cut, inside jit.

Replaces the reference's host-side per-item Python loop
(reference: DEX-TTS/model/tts.py:116-140) with a vmapped dynamic_slice:
offsets are drawn on-device from a jax.random key, shapes stay static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dex_tts_tpu.ops.masks import sequence_mask


def random_segment(
    key: jax.Array,
    y: jnp.ndarray,
    attn: jnp.ndarray,
    y_lengths: jnp.ndarray,
    out_size: int,
):
    """Cut a random out_size-frame window from mel + alignment.

    Args:
      y:    (B, n_feats, Ty)
      attn: (B, Tx, Ty)
      y_lengths: (B,)
      out_size: static segment length (e.g. 172 frames ≈ 2 s).

    Returns:
      (y_cut (B, n_feats, out_size), attn_cut (B, Tx, out_size),
       y_cut_lengths (B,), y_cut_mask (B, 1, out_size))
    """
    b = y.shape[0]
    max_offset = jnp.maximum(y_lengths - out_size, 0)
    # uniform in [0, max_offset] per item (reference picks in [0, max_offset))
    u = jax.random.uniform(key, (b,))
    offset = jnp.floor(u * jnp.maximum(max_offset, 1).astype(u.dtype)).astype(
        y_lengths.dtype
    )
    offset = jnp.minimum(offset, max_offset)

    def cut(arr, off):
        return jax.lax.dynamic_slice_in_dim(arr, off, out_size, axis=-1)

    y_cut = jax.vmap(cut)(y, offset)
    attn_cut = jax.vmap(cut)(attn, offset)
    y_cut_lengths = jnp.minimum(y_lengths, out_size)
    y_cut_mask = sequence_mask(y_cut_lengths, out_size)[:, None, :].astype(y.dtype)
    return y_cut * y_cut_mask, attn_cut * y_cut_mask, y_cut_lengths, y_cut_mask
