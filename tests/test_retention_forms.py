"""Recurrent / chunkwise / parallel retention equivalence (decayed mode)."""

import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.models.retention import (
    _head_decay,
    chunkwise_retention,
    recurrent_retention,
)


def parallel_reference(q, k, v, decay):
    """Unnormalized parallel decayed retention (the O(T²) form)."""
    b, h, t, d = q.shape
    gamma = np.exp(decay)
    idx = np.arange(t)
    diff = idx[:, None] - idx[None, :]
    mask = np.where(diff >= 0, gamma[:, None, None] ** diff[None], 0.0)
    scores = np.einsum("bhtd,bhsd->bhts", q, k) * mask[None]
    return np.einsum("bhts,bhsd->bhtd", scores, v)


def test_recurrent_matches_parallel():
    rng = np.random.default_rng(0)
    b, h, t, d = 2, 2, 17, 8
    q, k, v = (rng.standard_normal((b, h, t, d)).astype(np.float32) for _ in range(3))
    decay = _head_decay(h, False)
    want = parallel_reference(q, k, v, decay)
    got, state = recurrent_retention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(decay)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)
    assert state.shape == (b, h, d, d)


def test_chunkwise_matches_recurrent():
    rng = np.random.default_rng(1)
    b, h, t, d = 2, 2, 50, 8  # t not a multiple of the chunk size
    q, k, v = (rng.standard_normal((b, h, t, d)).astype(np.float32) for _ in range(3))
    decay = _head_decay(h, False)
    want, want_state = recurrent_retention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(decay)
    )
    got, got_state = chunkwise_retention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(decay),
        chunk_size=16,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4,
                               rtol=1e-4)
