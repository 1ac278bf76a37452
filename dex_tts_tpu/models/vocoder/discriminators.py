"""GAN discriminators + adversarial losses for vocoder training.

Capability equivalent of reference: DEX-TTS/bigvgan/models.py:221-395 —
multi-period discriminator (MPD: reshape the waveform by period, conv2d
stack) and multi-resolution discriminator (MRD: magnitude STFT at several
resolutions, conv2d stack), plus the least-squares GAN losses and the
feature-matching loss. The reference ships these untrained (inference-only
repo); here they make the vocoders trainable.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from dex_tts_tpu.audio.stft import stft_magnitude

LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class DiscriminatorConfig:
    mpd_periods: tuple = (2, 3, 5, 7, 11)
    mrd_resolutions: tuple = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))
    channel_mult: float = 1.0


class PeriodDiscriminator(nn.Module):
    """reference: DEX-TTS/bigvgan/models.py:221-255."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    channel_mult: float = 1.0

    @nn.compact
    def __call__(self, x):
        """x: (B, T) waveform → (logits (B, N), feature maps)."""
        b, t = x.shape
        pad = (-t) % self.period
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
            t = t + pad
        h = x.reshape(b, t // self.period, self.period, 1)  # NHWC

        fmap = []
        widths = [32, 128, 512, 1024]
        kp = (self.kernel_size // 2, self.kernel_size // 2)
        for i, w in enumerate(widths):
            h = nn.Conv(
                int(w * self.channel_mult),
                (self.kernel_size, 1),
                strides=(self.stride, 1),
                padding=[kp, (0, 0)],
                name=f"conv_{i}",
            )(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = nn.Conv(
            int(1024 * self.channel_mult),
            (self.kernel_size, 1),
            padding=[(2, 2), (0, 0)],
            name="conv_4",
        )(h)
        h = nn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
        h = nn.Conv(1, (3, 1), padding=[(1, 1), (0, 0)], name="conv_post")(h)
        fmap.append(h)
        return h.reshape(b, -1), fmap


class ResolutionDiscriminator(nn.Module):
    """reference: DEX-TTS/bigvgan/models.py:283-333."""

    resolution: tuple  # (n_fft, hop, win)
    channel_mult: float = 1.0

    @nn.compact
    def __call__(self, x):
        n_fft, hop, win = self.resolution
        pad = (n_fft - hop) // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        # center=False framed magnitude: reuse the shared STFT with zero
        # extra centering by trimming its reflect pad
        mag = _stft_mag_uncentered(xp, n_fft, hop, win)
        h = mag[:, :, :, None].swapaxes(1, 2)  # (B, T', F, 1)

        fmap = []
        ch = int(32 * self.channel_mult)
        specs = [
            ((3, 9), (1, 1), (1, 4)),
            ((3, 9), (1, 2), (1, 4)),
            ((3, 9), (1, 2), (1, 4)),
            ((3, 9), (1, 2), (1, 4)),
            ((3, 3), (1, 1), (1, 1)),
        ]
        for i, (k, s, p) in enumerate(specs):
            h = nn.Conv(
                ch, k, strides=s, padding=[(p[0], p[0]), (p[1], p[1])],
                name=f"conv_{i}",
            )(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], name="conv_post")(h)
        fmap.append(h)
        return h.reshape(x.shape[0], -1), fmap


def _stft_mag_uncentered(x, n_fft, hop, win):
    """torch.stft(center=False) magnitude on already-padded input."""
    from dex_tts_tpu.audio.stft import _padded_window

    window = jnp.asarray(_padded_window(n_fft, win))
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[:, idx] * window[None, None, :]
    return jnp.abs(jnp.fft.rfft(frames, n=n_fft, axis=-1)).swapaxes(1, 2)


class MultiPeriodDiscriminator(nn.Module):
    cfg: DiscriminatorConfig = DiscriminatorConfig()

    @nn.compact
    def __call__(self, y, y_hat):
        reals, fakes, fmap_r, fmap_g = [], [], [], []
        for p in self.cfg.mpd_periods:
            d = PeriodDiscriminator(
                p, channel_mult=self.cfg.channel_mult, name=f"p{p}"
            )
            r, fr = d(y)
            g, fg = d(y_hat)
            reals.append(r)
            fakes.append(g)
            fmap_r.append(fr)
            fmap_g.append(fg)
        return reals, fakes, fmap_r, fmap_g


class MultiResolutionDiscriminator(nn.Module):
    cfg: DiscriminatorConfig = DiscriminatorConfig()

    @nn.compact
    def __call__(self, y, y_hat):
        reals, fakes, fmap_r, fmap_g = [], [], [], []
        for i, res in enumerate(self.cfg.mrd_resolutions):
            d = ResolutionDiscriminator(
                tuple(res), channel_mult=self.cfg.channel_mult, name=f"r{i}"
            )
            r, fr = d(y)
            g, fg = d(y_hat)
            reals.append(r)
            fakes.append(g)
            fmap_r.append(fr)
            fmap_g.append(fg)
        return reals, fakes, fmap_r, fmap_g


def feature_loss(fmap_r, fmap_g):
    """reference: DEX-TTS/bigvgan/models.py:368-374."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(real_outputs, fake_outputs):
    """LSGAN discriminator objective.
    reference: DEX-TTS/bigvgan/models.py:377-389."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(real_outputs, fake_outputs):
        r = jnp.mean((1.0 - dr) ** 2)
        g = jnp.mean(dg**2)
        loss += r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(fake_outputs):
    """reference: DEX-TTS/bigvgan/models.py:392-400."""
    loss = 0.0
    gen_losses = []
    for dg in fake_outputs:
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses
