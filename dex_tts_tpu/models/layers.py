"""Shared flax.linen building blocks.

Each class documents the reference module it is behaviorally equivalent to.
Conventions (all different from the torch reference, by design):
  * sequences are channels-last (B, T, C) — XLA's native conv layout;
    mel images are (B, H, W, C).
  * masks are (B, T, 1) multiplicative floats.
  * dropout/droppath take an rng from the caller via linen's 'dropout' rng.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis with eps inside the sqrt.

    reference: DEX-TTS/model/text_encoder.py:11-29 (glow-tts LayerNorm,
    eps=1e-4, statistics over channels).
    """

    channels: int
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return x * gamma + beta


class RMSNorm(nn.Module):
    """reference: DEX-TTS/model/retention.py:49-68 (stats in fp32)."""

    dim: int
    eps: float = 1e-6
    elementwise_affine: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(
            jnp.mean(xf**2, axis=-1, keepdims=True) + self.eps
        )
        normed = normed.astype(dtype)
        if self.elementwise_affine:
            weight = self.param("weight", nn.initializers.ones, (self.dim,))
            normed = normed * weight
        return normed


class AdaptiveLayerNorm(nn.Module):
    """Style-conditioned layer norm: scale/bias are linear maps of a global
    style vector, initialized to identity.

    reference: DEX-TTS/model/base.py:161-194.
    """

    hidden_size: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, sty):  # x: (B, T, C), sty: (B, C)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        scale = nn.Dense(
            self.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones,
            name="W_scale",
        )(sty)
        bias = nn.Dense(
            self.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="W_bias",
        )(sty)
        return y * scale[:, None, :] + bias[:, None, :]


class Conv1d(nn.Module):
    """1-D convolution on (B, T, C) with torch-style symmetric padding."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size // 2) * self.dilation
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            padding=[(pad, pad)],
            use_bias=self.use_bias,
        )(x)


class ConvReluNorm(nn.Module):
    """Conv prenet: n_layers of [conv k → LN → relu → dropout], residual
    1x1 projection initialized to zero.

    reference: DEX-TTS/model/text_encoder.py:32-63.
    """

    hidden_channels: int
    out_channels: int
    kernel_size: int = 5
    n_layers: int = 3
    p_dropout: float = 0.5

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        x_org = x
        for i in range(self.n_layers):
            x = Conv1d(self.hidden_channels, self.kernel_size, name=f"conv_{i}")(
                x * x_mask
            )
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        proj = nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(x)
        return (x_org + proj) * x_mask


class DurationPredictor(nn.Module):
    """Two conv-relu-LN-drop blocks + 1x1 projection to log-durations.

    reference: DEX-TTS/model/text_encoder.py:66-92.
    """

    filter_channels: int
    kernel_size: int = 3
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        for i in (1, 2):
            x = Conv1d(self.filter_channels, self.kernel_size, name=f"conv_{i}")(
                x * x_mask
            )
            x = nn.relu(x)
            x = ChannelLayerNorm(self.filter_channels, name=f"norm_{i}")(x)
            x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = nn.Dense(1, name="proj")(x * x_mask)
        return x * x_mask


class BasicConv(nn.Module):
    """Conv1d (+BatchNorm | LayerNorm) (+ReLU), channels-last.

    reference: DEX-TTS/model/base.py:34-65. Note the reference order:
    conv → BN → relu, but conv → relu → LN (LayerNorm applied after relu).
    BatchNorm momentum 0.01 (torch) ⇒ linen momentum 0.99.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    relu: bool = True
    norm: bool = True
    norm_type: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv1d(
            self.features, self.kernel_size, stride=self.stride, use_bias=False
        )(x)
        if self.norm and self.norm_type == "bn":
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-5
            )(x)
        if self.relu:
            x = nn.relu(x)
        if self.norm and self.norm_type == "ln":
            x = nn.LayerNorm(epsilon=1e-5)(x)
        return x


def instance_norm_stats_1d(x, eps: float = 1e-5):
    """Per-(item, channel) mean/std over time of (B, T, C) → (B, 1, C).

    reference: DEX-TTS/model/base.py:67-88 (InstanceNorm1D.cal_stats; note
    the reference uses the *unbiased* variance via torch .var())."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    n = x.shape[1]
    var = jnp.sum((x - mean) ** 2, axis=1, keepdims=True) / max(n - 1, 1)
    std = jnp.sqrt(var + eps)
    return mean, std


def instance_norm_1d(x, eps: float = 1e-5):
    mean, std = instance_norm_stats_1d(x, eps)
    return (x - mean) / std


def instance_norm_stats_2d(x, eps: float = 1e-5):
    """(B, H, W, C) → mean/std (B, 1, 1, C) over H, W.

    reference: DEX-TTS/model/base.py:90-114 (unbiased variance)."""
    b, h, w, c = x.shape
    flat = x.reshape(b, h * w, c)
    mean = jnp.mean(flat, axis=1)
    var = jnp.sum((flat - mean[:, None, :]) ** 2, axis=1) / max(h * w - 1, 1)
    std = jnp.sqrt(var + eps)
    return mean[:, None, None, :], std[:, None, None, :]


def instance_norm_2d(x, eps: float = 1e-5):
    mean, std = instance_norm_stats_2d(x, eps)
    return (x - mean) / std


def mish(x):
    """reference: DEX-TTS/model/diffusion.py:11-13."""
    return x * jnp.tanh(jax.nn.softplus(x))


class DropPath(nn.Module):
    """Stochastic depth on the batch dim.

    reference: DEX-TTS/model/retention.py:383-394 (timm drop_path).
    """

    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.drop_prob == 0.0:
            return x
        keep = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class SinusoidalPosEmb(nn.Module):
    """Diffusion-time sinusoidal embedding, Grad-TTS convention.

    reference: DEX-TTS/model/diffusion.py:108-120 (emb = scale·t·freqs,
    freqs = exp(-log(1e4)·i/(half-1)), concat(sin, cos)).
    """

    dim: int

    def __call__(self, t, scale: float = 1000.0):
        half = self.dim // 2
        freqs = jnp.exp(
            -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - 1)
        )
        args = scale * t[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimestepEmbedder(nn.Module):
    """DiT timestep embedding: sinusoid (cos|sin order) → MLP(SiLU).

    reference: DEX-TTS/model/dit.py:219-256.
    """

    hidden_size: int
    freq_size: int = 256

    @nn.compact
    def __call__(self, t):
        half = self.freq_size // 2
        freqs = jnp.exp(
            -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = t[:, None].astype(jnp.float32) * freqs[None, :]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        emb = nn.Dense(self.hidden_size, name="fc1")(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.hidden_size, name="fc2")(emb)
