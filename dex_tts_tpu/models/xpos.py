"""xPos (extrapolatable position embedding) rotary helper.

Capability equivalent of reference: DEX-TTS/model/xpos_relative_position.py:
36-91 — a standalone rotary embedding with exponential length scaling. Like
the reference (where it is imported nowhere in the model path), this is a
utility module; it ships with the same self-test property: applying xPos to
q and k preserves inner products between same-offset pairs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fixed_pos_embedding(scale: jnp.ndarray, offset: int = 0):
    """(T, D/2) scale grid → (sin, cos) tables at positions offset..offset+T."""
    t, half = scale.shape
    inv_freq = 1.0 / (10000 ** (np.arange(half) / half))
    pos = jnp.arange(offset, offset + t, dtype=jnp.float32)
    sinusoid = jnp.einsum("i,j->ij", pos, jnp.asarray(inv_freq, jnp.float32))
    return jnp.sin(sinusoid), jnp.cos(sinusoid)


def rotate_every_two(x: jnp.ndarray) -> jnp.ndarray:
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack((-x2, x1), axis=-1).reshape(x.shape)


def duplicate_interleave(m: jnp.ndarray) -> jnp.ndarray:
    """(T, D/2) → (T, D) with each column repeated twice, interleaved."""
    return jnp.repeat(m, 2, axis=-1)


def apply_rotary_pos_emb(x, sin, cos, scale=1.0):
    sin = duplicate_interleave(sin * scale)
    cos = duplicate_interleave(cos * scale)
    return x * cos + rotate_every_two(x) * sin


class XPos:
    """reference: DEX-TTS/model/xpos_relative_position.py:36-82."""

    def __init__(self, head_dim: int, scale_base: int = 512):
        self.head_dim = head_dim
        self.scale_base = scale_base
        self.scale = (np.arange(0, head_dim, 2) + 0.4 * head_dim) / (
            1.4 * head_dim
        )

    def __call__(self, x: jnp.ndarray, offset: int = 0, downscale: bool = False):
        """x: (B, T, head_dim)."""
        length = x.shape[1]
        min_pos = -(length + offset) // 2
        max_pos = length + offset + min_pos
        power = (
            jnp.arange(min_pos, max_pos, 1, dtype=jnp.float32)
            / self.scale_base
        )
        scale = jnp.asarray(self.scale, jnp.float32)[None, :] ** power[:, None]
        sin, cos = fixed_pos_embedding(scale, offset=0)
        sin = sin[-length:]
        cos = cos[-length:]
        scale = scale[-length:]
        if downscale:
            scale = 1.0 / scale
        return apply_rotary_pos_emb(x, sin, cos, scale)
