"""BigVGAN generator: HiFi-GAN skeleton with anti-aliased periodic (snake)
activations.

Behavioral equivalent of reference: DEX-TTS/bigvgan/models.py:35-218,
bigvgan/activations.py:9-119, bigvgan/alias_free_torch/{filter,resample,
act}.py. Each AMP-block activation is 2× Kaiser-sinc upsample → snake /
snakebeta → 2× Kaiser-sinc downsample. Defaults match the released
bigvgan_22khz_80band checkpoint config (the weights dir the reference
loads at src/utils.py:266-274).

All filters are fixed buffers computed in numpy; depthwise convs run as
grouped XLA convolutions in NWC layout.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...ops.snake import (  # noqa: F401  (re-exported for tests/parity)
    _depthwise_conv,
    kaiser_sinc_filter,
    snake_antialias,
    snake_antialias_polyphase,
)
from .packing import PackedTimeConv
from .upsample import SubpixelConvTranspose


# The reference initializes every upsampler / resblock conv / conv_post
# with normal(0, 0.01) (reference: DEX-TTS/bigvgan/models.py:19-22,
# 48,58,106,181-183; hifigan/models.py:10-13). This is load-bearing at
# full scale: with flax's default lecun init the 19 additive snakes blow
# the pre-tanh activations up and the generator is born SATURATED
# (93% |out|>0.99 at init) — tanh gradients are dead and from-scratch
# training never recovers (measured r5: 800 supervised overfit steps
# stuck at wav_l1=1.0, and the GAN receipt collapsed the same way).
_W_INIT = nn.initializers.normal(0.01)


def _resolve_conv_impl(conv_impl: str, stage_dtype: str) -> str:
    """"auto" → plain. The packed lowering wins 2-4x per ISOLATED conv
    (scripts/perf_lane_packing.py) but loses at whole-generator level
    (roofline_bigvgan 2026-08-20: bf16 1225→1370 ms, f32 1478→1944 —
    the per-conv pack/unpack reshapes become real relayouts against the
    conv-operand layouts, +75 GB bf16 / +292 GB f32 of accessed bytes in
    the cost analysis). Kept as an opt-in "packed" for configurations
    where the activation can stay packed across a stage; "auto" stays
    plain until that exists."""
    if conv_impl != "auto":
        return conv_impl
    return "plain"


@dataclass(frozen=True)
class BigVGANConfig:
    num_mels: int = 80
    upsample_rates: tuple = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock: str = "1"
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    activation: str = "snakebeta"
    snake_logscale: bool = True
    # Compute dtype for the whole conv/activation chain. "bfloat16" keeps
    # every large tensor in ONE dtype end-to-end (no f32<->bf16 retiling
    # islands — the v5e killer, see unet.GroupNorm) and is ~4x faster;
    # params stay f32 (cast in-op). f32 default preserves checkpoint-exact
    # output for quality-critical offline use.
    dtype: str = "float32"
    # Route the anti-aliased snake through the fused pallas kernel
    # (bit-exact f32 where XLA default-precision convs round inputs to
    # bf16, but ~0.9x speed and minutes of Mosaic compile per shape —
    # see ops/snake.py). TPU only; ignored where shapes don't tile.
    snake_pallas: bool = False
    # Snake lowering: "auto" picks the measured winner per dtype on TPU
    # (fold for bf16 — 1.20x the f32 generator, vs 1.10x for XLA bf16;
    # polyphase for f32, where XLA's cross-op fusion beats the pallas
    # kernel 1.06x — scripts/perf_bigvgan.py 2026-08-19). "polyphase",
    # "fold", "pallas" force a lowering (see ops/snake.py). snake_pallas=
    # True overrides to "pallas" for back-compat. Non-polyphase impls
    # fall back to polyphase off-TPU.
    snake_impl: str = "auto"
    # Kaiser tap count for the snake's 2x anti-alias filters (k % 4 == 0).
    # 12 matches the reference (bigvgan/alias_free_torch/resample.py:14);
    # 8 trades stop-band attenuation for fewer VPU FLOPs — measured
    # RTF/SNR curve in scripts/perf_bigvgan.py / docs/PERFORMANCE.md.
    snake_taps: int = 12
    # Optional per-upsample-stage compute dtype overriding `dtype`
    # (len == len(upsample_rates); conv_pre runs in stage_dtypes[0], the
    # final act/conv_post in stage_dtypes[-1]). Lets the wide early
    # stages run bf16 while the waveform-resolution late stages stay f32.
    # Each f32<->bf16 boundary retiles one full-T tensor — keep the
    # boundary count at 1 (a prefix of bf16 stages, then f32).
    stage_dtypes: tuple | None = None
    # Upsampler lowering: "conv_transpose" (lax.conv_transpose over a
    # zero-inserted input) or "subpixel" (dense stride-1 conv +
    # depth-to-space interleave; identical math and params — see
    # vocoder/upsample.py).
    upsample_impl: str = "conv_transpose"
    # AMP-block conv lowering. "packed" = space-to-channel block-Toeplitz
    # conv (vocoder/packing.py): 2-4.1x per ISOLATED conv at the late
    # stages' C=24..48 (scripts/perf_lane_packing.py) but measured a NET
    # LOSS at whole-generator level (per-conv pack/unpack relayouts:
    # bf16 1225→1370 ms, f32 1478→1944, roofline_bigvgan 2026-08-20), so
    # "auto" resolves to "plain". Opt-in only until a whole-stage packed
    # pipeline (packed snake + convs, one pack/unpack per stage) exists.
    conv_impl: str = "auto"


def upsample2x_antialias(x, ratio: int = 2, kernel_size: int | None = None):
    """Zero-stuff ×ratio then Kaiser-sinc interpolate — equivalent to the
    reference's conv_transpose formulation
    (reference: bigvgan/alias_free_torch/resample.py:10-33)."""
    k = kernel_size if kernel_size is not None else int(6 * ratio // 2) * 2
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    filt = kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, k) * ratio

    b, t, c = x.shape
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    # zero-stuff: (B, T', C) → (B, T'·ratio, C)
    stuffed = jnp.zeros((b, x.shape[1] * ratio, c), x.dtype)
    stuffed = stuffed.at[:, ::ratio, :].set(x)
    # conv_transpose(filter) on stuffed input == correlation with the
    # flipped filter; the kaiser-sinc filter is symmetric for even k
    out = _depthwise_conv(
        jnp.pad(stuffed, ((0, 0), (k - 1, k - 1), (0, 0))), filt[::-1], 1
    )
    return out[:, pad_left : pad_left + ratio * t, :]


def downsample2x_antialias(x, ratio: int = 2, kernel_size: int | None = None):
    """Kaiser-sinc low-pass + decimate.
    reference: bigvgan/alias_free_torch/resample.py:36-48."""
    k = kernel_size if kernel_size is not None else int(6 * ratio // 2) * 2
    even = k % 2 == 0
    pad_left = k // 2 - int(even)
    pad_right = k // 2
    filt = kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, k)
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return _depthwise_conv(x, filt, ratio)


class SnakeActivation1d(nn.Module):
    """2× anti-aliased snake/snakebeta: up → x + (1/β)·sin²(αx) → down.
    reference: bigvgan/alias_free_torch/act.py + activations.py:9-119."""

    channels: int
    variant: str = "snakebeta"  # snake | snakebeta
    logscale: bool = True
    use_pallas: bool = False
    taps: int = 12
    # None lets snake_antialias resolve the legacy use_pallas flag;
    # the generator always passes an explicit impl (snake_impl knob).
    impl: str | None = None

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        init = nn.initializers.zeros if self.logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        if self.variant == "snakebeta":
            beta = self.param("beta", init, (self.channels,))
        else:
            beta = alpha
        if self.logscale:
            alpha, beta = jnp.exp(alpha), jnp.exp(beta)
        # (C,)-sized params: cast to the activation dtype in-op (tiny tensors,
        # no retiling cost)
        alpha = alpha.astype(x.dtype)
        inv_beta = (1.0 / (beta + 1e-9)).astype(x.dtype)
        return snake_antialias(
            x, alpha, inv_beta, use_pallas=self.use_pallas,
            kernel_size=self.taps, impl=self.impl,
        )


class AMPBlock1(nn.Module):
    """3× [act → dilated conv → act → conv → +x].
    reference: DEX-TTS/bigvgan/models.py:35-94."""

    channels: int
    kernel_size: int
    dilations: tuple
    variant: str
    logscale: bool
    dtype: str = "float32"
    use_pallas: bool = False
    taps: int = 12
    impl: str | None = None
    conv_impl: str = "plain"

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = SnakeActivation1d(
                self.channels, self.variant, self.logscale, self.use_pallas,
                self.taps, self.impl, name=f"act1_{i}"
            )(x)
            h = PackedTimeConv(
                self.channels,
                self.kernel_size,
                dilation=d,
                dtype=self.dtype,
                impl=self.conv_impl,
                kernel_init=_W_INIT,
                name=f"conv1_{i}",
            )(h)
            h = SnakeActivation1d(
                self.channels, self.variant, self.logscale, self.use_pallas,
                self.taps, self.impl, name=f"act2_{i}"
            )(h)
            h = PackedTimeConv(
                self.channels,
                self.kernel_size,
                dtype=self.dtype,
                impl=self.conv_impl,
                kernel_init=_W_INIT,
                name=f"conv2_{i}",
            )(h)
            x = x + h
        return x


class AMPBlock2(nn.Module):
    """2× [act → dilated conv → +x].
    reference: DEX-TTS/bigvgan/models.py:97-137."""

    channels: int
    kernel_size: int
    dilations: tuple
    variant: str
    logscale: bool
    dtype: str = "float32"
    use_pallas: bool = False
    taps: int = 12
    impl: str | None = None
    conv_impl: str = "plain"

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations[:2]):
            h = SnakeActivation1d(
                self.channels, self.variant, self.logscale, self.use_pallas,
                self.taps, self.impl, name=f"act_{i}"
            )(x)
            h = PackedTimeConv(
                self.channels,
                self.kernel_size,
                dilation=d,
                dtype=self.dtype,
                impl=self.conv_impl,
                kernel_init=_W_INIT,
                name=f"conv_{i}",
            )(h)
            x = x + h
        return x


class BigVGANGenerator(nn.Module):
    """reference: DEX-TTS/bigvgan/models.py:138-218."""

    cfg: BigVGANConfig = field(default_factory=BigVGANConfig)

    @nn.compact
    def __call__(self, mel):
        """mel: (B, num_mels, T) → wav (B, T·Πrates) in [-1, 1]."""
        cfg = self.cfg
        stage_dtypes = cfg.stage_dtypes or (cfg.dtype,) * len(
            cfg.upsample_rates
        )
        assert len(stage_dtypes) == len(cfg.upsample_rates), (
            stage_dtypes, cfg.upsample_rates,
        )
        dtype = jnp.dtype(stage_dtypes[0])
        x = mel.swapaxes(1, 2).astype(dtype)
        x = nn.Conv(
            cfg.upsample_initial_channel, (7,), padding=[(3, 3)],
            dtype=dtype, name="conv_pre",
        )(x)

        impl = "pallas" if cfg.snake_pallas else cfg.snake_impl
        block_cls = AMPBlock1 if cfg.resblock == "1" else AMPBlock2
        for i, (u, k) in enumerate(
            zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
        ):
            dtype = jnp.dtype(stage_dtypes[i])
            x = x.astype(dtype)
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            if cfg.upsample_impl == "subpixel":
                x = SubpixelConvTranspose(
                    ch, k, u, dtype=str(dtype), name=f"up_{i}"
                )(x)
            else:
                p = k - 1 - (k - u) // 2  # torch p=(k-u)//2 → flax k-1-p
                x = nn.ConvTranspose(
                    ch,
                    (k,),
                    strides=(u,),
                    padding=[(p, p)],
                    transpose_kernel=True,
                    dtype=dtype,
                    kernel_init=_W_INIT,
                    name=f"up_{i}",
                )(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                out = block_cls(
                    ch, rk, tuple(rd), cfg.activation, cfg.snake_logscale,
                    str(stage_dtypes[i]), cfg.snake_pallas, cfg.snake_taps,
                    impl, conv_impl=_resolve_conv_impl(
                        cfg.conv_impl, str(stage_dtypes[i])
                    ), name=f"resblock_{i}_{j}",
                )(x)
                acc = out if acc is None else acc + out
            x = acc / len(cfg.resblock_kernel_sizes)

        x = SnakeActivation1d(
            ch, cfg.activation, cfg.snake_logscale, cfg.snake_pallas,
            cfg.snake_taps, impl, name="act_post",
        )(x)
        x = nn.Conv(1, (7,), padding=[(3, 3)], dtype=dtype,
                kernel_init=_W_INIT, name="conv_post")(x)
        return jnp.tanh(x.astype(jnp.float32))[:, :, 0]
