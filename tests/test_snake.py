"""Anti-aliased snake op: polyphase + pallas-kernel parity.

reference: DEX-TTS/bigvgan/alias_free_torch/{act,resample}.py — the
composition up(2x) -> snake -> down(2x) is the behavioral spec; the
polyphase and pallas forms must match it to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dex_tts_tpu.models.vocoder.bigvgan import (
    downsample2x_antialias,
    upsample2x_antialias,
)
from dex_tts_tpu.ops import snake as sk


def _inputs(b, t, c, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    al = jnp.asarray(rng.uniform(0.5, 2.0, (c,)), jnp.float32)
    ib = jnp.asarray(rng.uniform(0.5, 2.0, (c,)), jnp.float32)
    return x, al, ib


@pytest.mark.parametrize(
    "b,t,c", [(2, 17, 5), (1, 64, 3), (3, 33, 8), (2, 1, 4), (1, 2, 2)]
)
def test_polyphase_matches_composition(b, t, c):
    x, al, ib = _inputs(b, t, c)
    up = upsample2x_antialias(x)
    s = up + ib * jnp.sin(up * al) ** 2
    ref = downsample2x_antialias(s)
    got = sk.snake_antialias_polyphase(x, al, ib)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize(
    "b,t,c", [(2, 768, 24), (1, 512, 128), (2, 1024, 48), (3, 256, 96)]
)
def test_pallas_kernel_matches_polyphase(b, t, c):
    """Interpret mode exercises the exact kernel code (grid, halo gather,
    interleave-aware boundary clipping) without TPU hardware."""
    x, al, ib = _inputs(b, t, c, seed=1)
    assert sk._pick_tiles(t, c) is not None
    ref = sk.snake_antialias_polyphase(x, al, ib)
    got = sk.snake_antialias_pallas(x, al, ib, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_multi_tile_boundaries():
    # T=768 with tile 256 -> 3 T-tiles: first/last tiles exercise the
    # interleave-aware edge clip, the middle tile the pure-halo path
    x, al, ib = _inputs(2, 768, 24, seed=2)
    tt, _ = sk._pick_tiles(768, 24)
    assert 768 // tt >= 3
    ref = sk.snake_antialias_polyphase(x, al, ib)
    got = sk.snake_antialias_pallas(x, al, ib, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_dispatch_defaults_to_polyphase_off_tpu():
    x, al, ib = _inputs(1, 512, 8)
    got = sk.snake_antialias(x, al, ib)
    ref = sk.snake_antialias_polyphase(x, al, ib)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_custom_vjp_matches_polyphase_grad():
    x, al, ib = _inputs(1, 256, 8, seed=3)

    def loss_pallas(x, al, ib):
        return jnp.sum(sk._snake_pallas_op(x, al, ib) ** 2)

    def loss_poly(x, al, ib):
        return jnp.sum(sk.snake_antialias_polyphase(x, al, ib) ** 2)

    # forward of _snake_pallas_op runs the compiled kernel — use interpret
    # via monkeypatching to stay CPU-safe
    orig = sk.snake_antialias_pallas
    sk.snake_antialias_pallas = lambda x, a, i, **kw: orig(x, a, i, interpret=True)
    try:
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, al, ib)
    finally:
        sk.snake_antialias_pallas = orig
    gr = jax.grad(loss_poly, argnums=(0, 1, 2))(x, al, ib)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [8, 16])
@pytest.mark.parametrize("b,t,c", [(2, 17, 5), (1, 64, 3)])
def test_polyphase_generalized_taps(k, b, t, c):
    """kernel_size != 12: the polyphase split must still match the naive
    zero-stuff composition built with the same k-tap Kaiser filters."""
    x, al, ib = _inputs(b, t, c, seed=4)
    up = upsample2x_antialias(x, kernel_size=k)
    s = up + ib * jnp.sin(up * al) ** 2
    ref = downsample2x_antialias(s, kernel_size=k)
    got = sk.snake_antialias_polyphase(x, al, ib, kernel_size=k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("k", [8, 16])
def test_pallas_kernel_generalized_taps(k):
    x, al, ib = _inputs(2, 768, 24, seed=5)
    ref = sk.snake_antialias_polyphase(x, al, ib, kernel_size=k)
    got = sk.snake_antialias_pallas(x, al, ib, kernel_size=k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_phase_filters_reject_non_mult4():
    with pytest.raises(AssertionError):
        sk._phase_filters(10)


# --- folded full-lane kernel (snake_antialias_fold) ---


@pytest.mark.parametrize(
    "b,t,c",
    [
        (2, 8192, 24),   # f=16, multi row-block
        (1, 4096, 48),   # f=8
        (2, 4096, 96),   # f=4
        (1, 2048, 128),  # f=1: pure sublane-roll path
        (1, 1024, 384),  # f=1, 3-vreg lanes
    ],
)
def test_fold_kernel_matches_polyphase(b, t, c):
    """Interpret mode exercises the exact kernel (folded layout, roll
    shifts with fold-boundary carry, halo gather, edge fixup)."""
    x, al, ib = _inputs(b, t, c, seed=6)
    assert sk._fold_ok(t, c)
    ref = sk.snake_antialias_polyphase(x, al, ib)
    got = sk.snake_antialias_fold(x, al, ib, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fold_edge_fixup_exact_at_boundaries():
    """First/last samples go through the interleave-aware clipping of the
    reference; the fold path recomputes them via polyphase — they must be
    bitwise-identical to the polyphase output there."""
    x, al, ib = _inputs(2, 8192, 24, seed=7)
    ref = np.asarray(sk.snake_antialias_polyphase(x, al, ib))
    got = np.asarray(sk.snake_antialias_fold(x, al, ib, interpret=True))
    np.testing.assert_array_equal(got[:, :16], ref[:, :16])
    np.testing.assert_array_equal(got[:, -16:], ref[:, -16:])


@pytest.mark.parametrize("k", [8, 16])
def test_fold_kernel_generalized_taps(k):
    x, al, ib = _inputs(1, 4096, 48, seed=8)
    ref = sk.snake_antialias_polyphase(x, al, ib, kernel_size=k)
    got = sk.snake_antialias_fold(x, al, ib, kernel_size=k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fold_bf16():
    x, al, ib = _inputs(1, 4096, 24, seed=9)
    xb = x.astype(jnp.bfloat16)
    ref = sk.snake_antialias_polyphase(xb, al.astype(jnp.bfloat16),
                                       ib.astype(jnp.bfloat16))
    got = sk.snake_antialias_fold(xb, al.astype(jnp.bfloat16),
                                  ib.astype(jnp.bfloat16), interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.15
    )


def test_fold_custom_vjp_matches_polyphase_grad():
    x, al, ib = _inputs(1, 2048, 24, seed=10)

    def loss_fold(x, al, ib):
        return jnp.sum(sk._snake_fold_op(x, al, ib) ** 2)

    def loss_poly(x, al, ib):
        return jnp.sum(sk.snake_antialias_polyphase(x, al, ib) ** 2)

    orig = sk.snake_antialias_fold
    sk.snake_antialias_fold = lambda x, a, i, **kw: orig(
        x, a, i, **{**kw, "interpret": True}
    )
    try:
        gp = jax.grad(loss_fold, argnums=(0, 1, 2))(x, al, ib)
    finally:
        sk.snake_antialias_fold = orig
    gr = jax.grad(loss_poly, argnums=(0, 1, 2))(x, al, ib)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_fold_dispatch_falls_back_off_tpu():
    """impl='fold' off-TPU must silently use polyphase (identical output)."""
    x, al, ib = _inputs(1, 4096, 24, seed=11)
    got = sk.snake_antialias(x, al, ib, impl="fold")
    ref = sk.snake_antialias_polyphase(x, al, ib)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fold_ok_predicate():
    assert sk._fold_ok(196608, 24) and sk._fold_ok(3072, 768)
    assert not sk._fold_ok(100, 24)      # T % f != 0
    assert not sk._fold_ok(4096, 7)      # no lane-filling fold factor
    assert sk._fold_factor(24) == 16 and sk._fold_factor(96) == 4
    assert sk._fold_factor(768) == 1


def test_auto_impl_dispatch():
    """impl='auto' = fold for bf16 on TPU, polyphase otherwise; off-TPU
    both resolve to polyphase (exact equality with the direct call)."""
    x, al, ib = _inputs(1, 4096, 24, seed=12)
    for dt in (jnp.float32, jnp.bfloat16):
        xd = x.astype(dt)
        got = sk.snake_antialias(xd, al.astype(dt), ib.astype(dt),
                                 impl="auto")
        ref = sk.snake_antialias_polyphase(xd, al.astype(dt),
                                           ib.astype(dt))
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))


def test_sin2_fast_polynomial_accuracy():
    """r5: the bf16 fold path replaces XLA's precise sin with a
    range-reduced degree-7 polynomial (the fold custom-calls are
    VPU-compute-bound; sin was a large share of the per-element ops).
    The poly must sit far below bf16 output rounding (~4e-3)."""
    from dex_tts_tpu.ops.snake import _sin2_fast

    t = jnp.asarray(
        np.random.default_rng(0).uniform(-200, 200, 50000), jnp.float32
    )
    got = np.asarray(_sin2_fast(t))
    ref = np.sin(np.asarray(t, np.float64)) ** 2
    assert np.abs(got - ref).max() < 5e-5

    # fold kernel with fast_sin=True (interpret) vs exact polyphase:
    # identical to bf16 working precision
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 256, 32)), jnp.bfloat16)
    al = jnp.asarray(rng.standard_normal((32,)) * 0.3, jnp.float32)
    ib = jnp.asarray(rng.standard_normal((32,)) * 0.3, jnp.float32)
    from dex_tts_tpu.ops.snake import (
        snake_antialias_fold,
        snake_antialias_polyphase,
    )

    fast = np.asarray(
        snake_antialias_fold(x, al, ib, interpret=True, fast_sin=True),
        np.float32,
    )
    exact = np.asarray(
        snake_antialias_polyphase(
            x.astype(jnp.float32), al, ib
        ),
        np.float32,
    )
    assert np.abs(fast - exact).max() < 0.05  # bf16 storage rounding


def test_fold_batchlanes_matches_polyphase():
    """r5 opt-in batch-in-lanes fold orientation (snake_impl="foldb"):
    exact math vs polyphase (measured a whole-generator LOSS on v5e —
    see ops/snake.py docstring — but the lowering must stay correct)."""
    from dex_tts_tpu.ops.snake import (
        snake_antialias_fold_batchlanes,
        snake_antialias_polyphase,
    )

    rng = np.random.default_rng(9)
    for b, t, c in [(16, 512, 24), (8, 256, 16)]:
        x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
        al = jnp.asarray(rng.standard_normal((c,)) * 0.3, jnp.float32)
        ib = jnp.asarray(rng.standard_normal((c,)) * 0.3, jnp.float32)
        ref = np.asarray(snake_antialias_polyphase(x, al, ib))
        got = np.asarray(
            snake_antialias_fold_batchlanes(
                x, al, ib, interpret=True, fast_sin=False
            )
        )
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
