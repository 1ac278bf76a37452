import jax
import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.models.vocoder.discriminators import (
    DiscriminatorConfig,
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)

CFG = DiscriminatorConfig(
    mpd_periods=(2, 3),
    mrd_resolutions=((256, 64, 256), (128, 32, 128)),
    channel_mult=0.125,
)


def test_mpd_forward_and_losses():
    mpd = MultiPeriodDiscriminator(CFG)
    y = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 1024)), jnp.float32)
    y_hat = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 1024)), jnp.float32)
    variables = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    reals, fakes, fmap_r, fmap_g = mpd.apply(variables, y, y_hat)
    assert len(reals) == len(fakes) == 2
    assert len(fmap_r[0]) == 6

    d_loss, r_losses, g_losses = discriminator_loss(reals, fakes)
    g_loss, _ = generator_loss(fakes)
    f_loss = feature_loss(fmap_r, fmap_g)
    for v in (d_loss, g_loss, f_loss):
        assert np.isfinite(float(v))
    assert len(r_losses) == 2


def test_mrd_forward():
    mrd = MultiResolutionDiscriminator(CFG)
    y = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (2, 1024)), jnp.float32)
    variables = mrd.init(jax.random.PRNGKey(0), y, y)
    reals, fakes, fmap_r, fmap_g = mrd.apply(variables, y, y)
    assert len(reals) == 2
    # identical inputs → identical outputs, zero feature loss
    np.testing.assert_allclose(np.asarray(reals[0]), np.asarray(fakes[0]))
    assert float(feature_loss(fmap_r, fmap_g)) == 0.0


def test_discriminator_gradients_flow():
    mpd = MultiPeriodDiscriminator(CFG)
    y = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (1, 512)), jnp.float32)
    variables = mpd.init(jax.random.PRNGKey(0), y, y)

    def loss_fn(params, y_hat):
        _, fakes, _, _ = mpd.apply({"params": params}, y, y_hat)
        loss, _ = generator_loss(fakes)
        return loss

    g = jax.grad(loss_fn, argnums=1)(variables["params"], y * 0.5)
    assert float(jnp.abs(g).sum()) > 0
