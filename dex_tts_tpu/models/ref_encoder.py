"""Reference-speech style modeling (DEX only): time-variable (TV) and
time-invariant (TIV) style encoders, lf0 encoder, EMA vector quantizer, and
the two bottleneck adaptors.

reference: DEX-TTS/model/ref_encoder.py:8-273. Layout: sequences are
channels-last (B, T, C); masks (B, T, 1).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dex_tts_tpu.models.layers import (
    BasicConv,
    ChannelLayerNorm,
    Conv1d,
    instance_norm_1d,
    instance_norm_stats_1d,
    instance_norm_stats_2d,
)


class Projection(nn.Module):
    """conv→relu→LN→drop ×2 → 1x1 proj, all masked.
    reference: DEX-TTS/model/ref_encoder.py:8-34."""

    c_h: int
    kernel_size: int = 3
    p_drop: float = 0.1

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        for i in (1, 2):
            x = Conv1d(self.c_h, self.kernel_size, name=f"conv_{i}")(x * mask)
            x = nn.relu(x)
            x = ChannelLayerNorm(self.c_h, name=f"norm_{i}")(x)
            x = nn.Dropout(self.p_drop, deterministic=not train)(x)
        x = nn.Dense(self.c_h, name="proj")(x * mask)
        return x * mask


class BiGRU(nn.Module):
    """Bidirectional multi-layer GRU, hidden c_h//2 per direction, outputs
    concatenated — equivalent to the torch nn.GRU(bidirectional=True) inside
    the lf0 encoder (reference: DEX-TTS/model/ref_encoder.py:41)."""

    hidden: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.GRUCell(self.hidden, name=f"fwd_{i}"))(x)
            bwd = nn.RNN(
                nn.GRUCell(self.hidden, name=f"bwd_{i}"),
                reverse=True,
                keep_order=True,
            )(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        return x


class LF0Encoder(nn.Module):
    """conv → bi-GRU → conv (+ detached projection branch for the decoder).
    reference: DEX-TTS/model/ref_encoder.py:36-55."""

    c_h: int = 192
    c_out: int = 192
    c_out_g: int = 192
    num_layer: int = 2

    @nn.compact
    def __call__(self, lf0, mask, train: bool = False):
        """lf0: (B, T); mask: (B, T, 1). Returns (enc (B,T,c_out),
        dec (B,T,c_out_g))."""
        x = lf0[:, :, None]
        x = BasicConv(self.c_h, 3, norm_type="ln", name="in_conv")(
            x * mask, train=train
        ) * mask
        x = BiGRU(self.c_h // 2, self.num_layer, name="rnn")(x)
        x = BasicConv(self.c_out, 3, norm_type="ln", name="out_conv")(
            x * mask, train=train
        ) * mask

        dec = Projection(self.c_out_g, name="proj")(
            jax.lax.stop_gradient(x), mask, train=train
        )
        return x, dec


class ResidualConvBlock(nn.Module):
    """x + conv(c→h, norm, relu) → conv(h→c, plain).
    reference: DEX-TTS/model/ref_encoder.py:57-81 (TIV: BN, TV: LN)."""

    c_h: int
    norm_type: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = BasicConv(self.c_h, 3, norm_type=self.norm_type, name="conv1")(
            x, train=train
        )
        h = BasicConv(x.shape[-1], 3, relu=False, norm=False, name="conv2")(
            h, train=train
        )
        return x + h


class VQEmbeddingEMA(nn.Module):
    """EMA-updated vector quantizer with straight-through estimator.

    reference: DEX-TTS/model/ref_encoder.py:181-237. Codebook state lives in
    the 'vq_stats' variable collection (updated when it is mutable and
    train=True) — the JAX analogue of the reference's registered buffers.
    """

    n_embeddings: int = 512
    embedding_dim: int = 192
    commitment_cost: float = 0.25
    decay: float = 0.999
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        """x: (B, T, D), mask: (B, T, 1) → (quantized, commitment loss)."""
        m, d = self.n_embeddings, self.embedding_dim
        init_bound = 1.0 / m
        embedding = self.variable(
            "vq_stats",
            "embedding",
            lambda key: jax.random.uniform(key, (m, d), minval=-init_bound,
                                           maxval=init_bound),
            self.make_rng("params") if self.is_initializing() else None,
        )
        ema_count = self.variable(
            "vq_stats", "ema_count", lambda: jnp.zeros((m,))
        )
        ema_weight = self.variable(
            # copy: aliasing the embedding buffer breaks donation (the train
            # step would donate the same buffer twice)
            "vq_stats", "ema_weight", lambda: jnp.array(embedding.value)
        )

        x = x * mask
        flat = jax.lax.stop_gradient(x).reshape(-1, d)

        codes = embedding.value
        distances = (
            jnp.sum(codes**2, axis=1)[None, :]
            + jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ codes.T
        )
        indices = jnp.argmin(distances, axis=-1)
        quantized = codes[indices].reshape(x.shape)

        if train and not self.is_initializing():
            onehot = jax.nn.one_hot(indices, m, dtype=flat.dtype)
            counts = jnp.sum(onehot, axis=0)
            new_count = self.decay * ema_count.value + (1 - self.decay) * counts
            n = jnp.sum(new_count)
            new_count = (new_count + self.epsilon) / (n + m * self.epsilon) * n
            dw = onehot.T @ flat
            new_weight = self.decay * ema_weight.value + (1 - self.decay) * dw
            ema_count.value = new_count
            ema_weight.value = new_weight
            embedding.value = new_weight / new_count[:, None]

        e_latent = jnp.sum((x * mask - jax.lax.stop_gradient(quantized) * mask) ** 2)
        e_latent = e_latent / (jnp.sum(mask) * d)
        loss = self.commitment_cost * e_latent

        quantized = x + jax.lax.stop_gradient(quantized - x)
        return quantized * mask, loss


class TVEncoder(nn.Module):
    """Time-variable style encoder: conv blocks (LN) → VQ-EMA → projection
    branch for the decoder. Returns (pre-VQ features, projected quantized
    features, vq loss). reference: DEX-TTS/model/ref_encoder.py:108-140."""

    c_h: int = 128
    c_out: int = 192
    c_out_g: int = 192
    num_layer: int = 6
    n_emb: int = 512
    commit_w: float = 0.25

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        """x: (B, T, n_mels), mask: (B, T, 1)."""
        x = BasicConv(self.c_h, 3, norm_type="ln", name="in_conv")(
            x * mask, train=train
        ) * mask
        for i in range(self.num_layer):
            x = ResidualConvBlock(self.c_h, "ln", name=f"block_{i}")(
                x * mask, train=train
            ) * mask
        z_pre_vq = BasicConv(
            self.c_out, 3, relu=False, norm=False, name="out_conv"
        )(x * mask) * mask

        z_q, vq_loss = VQEmbeddingEMA(
            self.n_emb, self.c_out, self.commit_w, name="vq"
        )(z_pre_vq, mask, train=train)

        z_dec = Projection(self.c_out_g, name="proj_0")(
            jax.lax.stop_gradient(z_q), mask, train=train
        )
        z_dec = BasicConv(self.c_out_g, 3, norm_type="bn", name="proj_1")(
            z_dec * mask, train=train
        ) * mask
        return z_pre_vq, z_dec, vq_loss


class TIVEncoder(nn.Module):
    """Time-invariant style encoder: conv blocks (BN) with per-block skip
    outputs; instance-norm between blocks.
    reference: DEX-TTS/model/ref_encoder.py:83-106."""

    c_h: int = 128
    c_out: int = 64
    num_layer: int = 6

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        """x: (B, T, n_mels) → (out (B,T,c_out), skips list of (B,T,c_h))."""
        x = BasicConv(self.c_h, 3, norm_type="bn", name="in_conv")(
            x * mask, train=train
        ) * mask
        skips = []
        for i in range(self.num_layer):
            x = ResidualConvBlock(self.c_h, "bn", name=f"block_{i}")(
                x * mask, train=train
            ) * mask
            skips.append(x)
            x = instance_norm_1d(x)
        # NB: the reference's out_conv keeps the default relu=True
        # (ref_encoder.py:93 — only `norm` is passed)
        x = BasicConv(self.c_out, 3, relu=True, norm_type="bn", name="out_conv")(
            x * mask, train=train
        ) * mask
        return x, skips


def stack_skip_stats(skips):
    """Per-block mean/std of TIV skips → (B, L, C) each.

    reference: DEX-TTS/model/diffusion.py:177-188 (stats over the full
    padded time axis, matching InstanceNorm1D.cal_stats which ignores
    lengths)."""
    means, stds = [], []
    for s in skips:
        m, sd = instance_norm_stats_1d(s)
        means.append(m)
        stds.append(sd)
    return jnp.concatenate(means, axis=1), jnp.concatenate(stds, axis=1)


class SelfAttentionPooling(nn.Module):
    """Softmax pooling over a sequence with a prepended time token.
    reference: DEX-TTS/model/ref_encoder.py:239-253."""

    @nn.compact
    def __call__(self, x, time):  # x: (B, L, C); time: (B, 1, C)
        x = jnp.concatenate([time, x], axis=1)
        attn = nn.Dense(1, name="W")(x)[:, :, 0]
        attn = jax.nn.softmax(attn, axis=-1)[:, :, None]
        return jnp.sum(x * attn, axis=1)  # (B, C)


class TIVAdaptor(nn.Module):
    """Adaptive instance norm of the U-Net mid feature with SAP-pooled
    reference stats. reference: DEX-TTS/model/ref_encoder.py:255-273.

    Statistics (instance norm, SAP softmax) are computed in f32; the big
    feature map stays in its input dtype (bf16-friendly)."""

    @nn.compact
    def __call__(self, x, ref, time):
        """x: (B, H, W, C); ref: (means (B,L,C), stds (B,L,C));
        time: (B, 1, C)."""
        ref_mean, ref_std = ref
        mean = SelfAttentionPooling(name="mean_sap")(ref_mean, time)
        std = SelfAttentionPooling(name="std_sap")(ref_std, time)
        mean2, std2 = instance_norm_stats_2d(x.astype(jnp.float32))
        scale = (std[:, None, None, :] / std2).astype(x.dtype)
        shift = (mean[:, None, None, :] - mean2 * std[:, None, None, :] / std2
                 ).astype(x.dtype)
        return x * scale + shift


class TVAdaptor(nn.Module):
    """Single-head cross-attention from the mid feature map (queries) to
    the TV style sequence + time token (keys/values), additive residual.
    reference: DEX-TTS/model/ref_encoder.py:142-179."""

    @nn.compact
    def __call__(self, x, x_mask, sty, sty_mask, time):
        """x: (B, H, W, C); x_mask: (B, 1, W, 1); sty: (B, Ts, C);
        sty_mask: (B, Ts); time: (B, 1, C). Runs in x.dtype with f32
        softmax/instance-norm statistics."""
        b, h, w, c = x.shape
        d_k = c**0.5
        dt = x.dtype

        sty = jnp.concatenate([time, sty], axis=1).astype(dt)  # (B, Ts+1, C)
        smask = jnp.concatenate(
            [jnp.ones((b, 1), sty_mask.dtype), sty_mask], axis=1
        )  # (B, Ts+1)

        mean2, std2 = instance_norm_stats_2d(x.astype(jnp.float32))
        xn = x * (1.0 / std2).astype(dt) - (mean2 / std2).astype(dt)
        q = nn.Dense(c, use_bias=False, dtype=dt, name="w_q")(xn)
        k = nn.Dense(c, use_bias=False, dtype=dt, name="w_k")(sty)
        v = nn.Dense(c, use_bias=False, dtype=dt, name="w_v")(sty)

        attn = jnp.einsum(
            "bhwc,btc->bhwt", q / jnp.asarray(d_k, dt), k,
            preferred_element_type=jnp.float32,
        )
        attn = jnp.where(smask[:, None, None, :] == 0, -1e4, attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(dt)
        out = jnp.einsum(
            "bhwt,btc->bhwc", attn, v, preferred_element_type=jnp.float32
        ).astype(dt)
        out = nn.Dense(c, use_bias=False, dtype=dt, name="linear")(out)
        return (x + out) * x_mask.astype(dt)
