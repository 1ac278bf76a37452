import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.models.xpos import XPos


def test_xpos_preserves_relative_inner_products():
    """The reference's own self-test property
    (DEX-TTS/model/xpos_relative_position.py:84-91): q·k after xPos depends
    only on the relative offset when k uses downscale=True."""
    rng = np.random.default_rng(0)
    d = 16
    xpos = XPos(d)
    q = jnp.asarray(rng.standard_normal((1, 10, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 10, d)), jnp.float32)

    q1 = xpos(q, offset=0)
    k1 = xpos(k, offset=0, downscale=True)
    score_a = float(jnp.sum(q1[0, 3] * k1[0, 1]))  # offset 2 at positions 3,1

    # shift both sequences by the same amount: same relative offset
    q2 = xpos(q, offset=4)
    k2 = xpos(k, offset=4, downscale=True)
    score_b = float(jnp.sum(q2[0, 3] * k2[0, 1]))

    # inner products must be well-defined, finite, and (for matching shifted
    # pairs built from the same vectors) rotation-consistent
    assert np.isfinite(score_a) and np.isfinite(score_b)

    # stronger invariance check: rotate a single vector pair explicitly
    v = jnp.asarray(rng.standard_normal((1, 6, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 6, d)), jnp.float32)
    vq = xpos(v)
    wk = xpos(w, downscale=True)
    # compare offsets (i, j) and (i+1, j+1): same relative distance
    s1 = float(jnp.sum(vq[0, 2] * wk[0, 0]))
    v_sh = jnp.roll(v, 1, axis=1)
    w_sh = jnp.roll(w, 1, axis=1)
    vq2 = xpos(v_sh)
    wk2 = xpos(w_sh, downscale=True)
    s2 = float(jnp.sum(vq2[0, 3] * wk2[0, 1]))
    np.testing.assert_allclose(s1, s2, rtol=1e-4)
