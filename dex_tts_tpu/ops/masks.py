"""Jittable mask / alignment-path utilities.

Behavioral equivalents of reference: DEX-TTS/model/utils.py:6-44, designed
for static shapes under jit (max lengths are Python ints, real lengths are
traced arrays).
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) lengths → (B, max_length) bool mask.

    reference: DEX-TTS/model/utils.py:6-10 (max_length must be static here —
    XLA needs a fixed shape; callers pass the padded length).
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def fix_len_compatibility(length: int, num_downsamplings_in_unet: int = 2) -> int:
    """Round ``length`` up to a multiple of 2**num_downsamplings (U-Net
    down/up path). reference: DEX-TTS/model/utils.py:13-17."""
    factor = 2 ** num_downsamplings_in_unet
    return int(-(-length // factor) * factor)


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Durations → binary monotonic alignment path.

    duration: (B, Tx) non-negative (float ok), mask: (B, Tx, Ty).
    Cumulative-sum trick, reference: DEX-TTS/model/utils.py:26-39.
    """
    b, t_x, t_y = mask.shape
    cum = jnp.cumsum(duration, axis=1)  # (B, Tx)
    pos = jnp.arange(t_y, dtype=cum.dtype)
    # row x covers frames [cum[x-1], cum[x])
    upper = pos[None, None, :] < cum[:, :, None]
    lower = jnp.pad(upper, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    path = upper.astype(mask.dtype) - lower.astype(mask.dtype)
    return path * mask


def duration_loss(logw: jnp.ndarray, logw_: jnp.ndarray, lengths: jnp.ndarray):
    """MSE between predicted and MAS log-durations, normalized by Σlengths.
    reference: DEX-TTS/model/utils.py:42-44."""
    return jnp.sum((logw - logw_) ** 2) / jnp.sum(lengths)
