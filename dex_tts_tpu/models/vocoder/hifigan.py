"""HiFi-GAN generator (mel → waveform), inference-oriented.

Behavioral equivalent of reference: DEX-TTS/hifigan/models.py:112-174 with
arch config hifigan/config.json: conv_pre(80→512, k7) → 4× [leaky(0.1) →
ConvTranspose1d ×(8,8,2,2)] each followed by the mean of 3 multi-dilation
ResBlocks (k 3/7/11, d 1/3/5) → leaky(default 0.01) → conv_post → tanh.

Weight norm is folded at checkpoint-conversion time (the reference calls
remove_weight_norm() before inference — hifigan/models.py:166-173), so this
module holds plain conv kernels. Layout NWC.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from dex_tts_tpu.models.vocoder.upsample import SubpixelConvTranspose

LRELU_SLOPE = 0.1

# reference init for ups / resblock convs / conv_post: normal(0, 0.01)
# (reference: DEX-TTS/hifigan/models.py:10-13,58,94,146-147). Load-
# bearing for from-scratch training — flax's default lecun init leaves
# the deep additive stack born tanh-saturated (see bigvgan.py _W_INIT).
_W_INIT = nn.initializers.normal(0.01)


@dataclass(frozen=True)
class HiFiGANConfig:
    num_mels: int = 80
    upsample_rates: tuple = (8, 8, 2, 2)
    upsample_kernel_sizes: tuple = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    # compute dtype of the conv stack (params stay float32). Plain (non-
    # grouped) 1-D convs run fast in bfloat16 on v5e; the final conv_post +
    # tanh stay float32 regardless so the waveform keeps full precision.
    dtype: str = "float32"
    # upsampler lowering: "conv_transpose" (lax.conv_transpose, zero-
    # inserted input) or "subpixel" (dense stride-1 conv + depth-to-space;
    # same params/math — see vocoder/upsample.py).
    upsample_impl: str = "conv_transpose"


def _same_pad(kernel: int, dilation: int = 1) -> int:
    return (kernel * dilation - dilation) // 2


class ResBlock(nn.Module):
    """3× [leaky → dilated conv → leaky → plain conv → +x].
    reference: DEX-TTS/hifigan/models.py:20-108 (ResBlock1)."""

    channels: int
    kernel_size: int
    dilations: tuple
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dt = jnp.dtype(self.dtype)
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = nn.Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=(d,),
                padding=[(_same_pad(self.kernel_size, d),) * 2],
                dtype=dt,
                kernel_init=_W_INIT,
                name=f"conv1_{i}",
            )(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            h = nn.Conv(
                self.channels,
                (self.kernel_size,),
                padding=[(_same_pad(self.kernel_size),) * 2],
                dtype=dt,
                kernel_init=_W_INIT,
                name=f"conv2_{i}",
            )(h)
            x = x + h
        return x


class HiFiGANGenerator(nn.Module):
    cfg: HiFiGANConfig = field(default_factory=HiFiGANConfig)

    @nn.compact
    def __call__(self, mel):
        """mel: (B, num_mels, T) log-mel → waveform (B, T·256) in [-1, 1]."""
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = mel.swapaxes(1, 2).astype(dt)  # NWC
        x = nn.Conv(
            cfg.upsample_initial_channel, (7,), padding=[(3, 3)], dtype=dt,
            name="conv_pre",
        )(x)

        for i, (u, k) in enumerate(
            zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
        ):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            # torch ConvTranspose1d(k, u, padding=(k-u)//2) ⇒ out = u·in;
            # flax explicit pad = k-1-(k-u)//2 (see unet.Upsample note)
            if cfg.upsample_impl == "subpixel":
                x = SubpixelConvTranspose(
                    ch, k, u, dtype=cfg.dtype, name=f"up_{i}"
                )(x)
            else:
                p = k - 1 - (k - u) // 2
                x = nn.ConvTranspose(
                    ch,
                    (k,),
                    strides=(u,),
                    padding=[(p, p)],
                    transpose_kernel=True,
                    dtype=dt,
                    kernel_init=_W_INIT,
                    name=f"up_{i}",
                )(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                out = ResBlock(
                    ch, rk, tuple(rd), dtype=cfg.dtype,
                    name=f"resblock_{i}_{j}",
                )(x)
                acc = out if acc is None else acc + out
            x = acc / len(cfg.resblock_kernel_sizes)

        x = nn.leaky_relu(x.astype(jnp.float32))  # torch default slope 0.01 (models.py:164)
        x = nn.Conv(1, (7,), padding=[(3, 3)], kernel_init=_W_INIT,
                    name="conv_post")(x)
        return jnp.tanh(x)[:, :, 0]
