"""Retention-network text encoder core.

The reference uses a Microsoft-torchscale-derived RetNet as a *non-causal
text encoder* (reference: DEX-TTS/model/retnet.py:5-184,
model/retention.py:49-514). With the shipped configs
(use_softmax=True, use_decay=False — e.g. DEX-TTS/config/VCTK/base.yaml:60-61)
retention degenerates to softmax attention with a rotary θ-shift and a swish
output gate; the decay mask is just the padding-mask outer product
(model/retention.py:140-147). This module implements that computation
directly in linen — one fused attention per layer, MXU-shaped (B,H,T,D)
einsums — while also supporting the decayed (use_decay=True) parallel form
for parity with the full retention formulation.

The reference's recurrent and chunkwise forward_impls
(model/retention.py:99-135) are dead code there (never exercised by any
shipped config) but ARE carried over here in working form —
`recurrent_retention` and `chunkwise_retention` below — with
parallel-form equivalence tests (tests/test_retention_forms.py). The
shipped encoder always uses the parallel form: static-shape parallel
attention is the TPU-correct choice at these sequence lengths
(≤ ~400 tokens).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.models.layers import AdaptiveLayerNorm, DropPath, RMSNorm


@dataclass(frozen=True)
class RetNetEncoderConfig:
    """Mirrors the knobs of the reference RetNetConfig that the TTS text
    encoder actually uses (reference: DEX-TTS/model/retnet_cfg.py:14-117)."""

    embed_dim: int = 192
    value_dim: int = 192
    ffn_dim: int = 1024
    num_layers: int = 8
    num_heads: int = 2
    dropout: float = 0.1
    activation_dropout: float = 0.0
    drop_path_rate: float = 0.1
    layernorm_eps: float = 1e-6
    activation: str = "gelu"
    use_glu: bool = True
    use_softmax: bool = True
    use_decay: bool = False
    use_lm_decay: bool = False
    use_adaln: bool = False  # True for DEX (style-conditioned layers)


def _rotary_angle(key_dim: int) -> np.ndarray:
    """Per-dim rotary angles, each frequency repeated for the (even, odd)
    pair. reference: DEX-TTS/model/retention.py:79-80."""
    half = key_dim // 2
    angle = 1.0 / (10000 ** np.linspace(0, 1, half))
    return np.repeat(angle, 2).astype(np.float32)


def _head_decay(num_heads: int, use_lm_decay: bool) -> np.ndarray:
    """Per-head log-decay γ. reference: DEX-TTS/model/retention.py:82-88."""
    if use_lm_decay:
        s, e = np.log(1 / 32), np.log(1 / 512)
        return np.log(1 - np.exp(np.linspace(s, e, num_heads))).astype(np.float32)
    return np.log(1 - 2.0 ** (-5.0 - np.arange(num_heads))).astype(np.float32)


def rotate_every_two(x: jnp.ndarray) -> jnp.ndarray:
    """(…, 2k) → interleaved (-x_odd, x_even).
    reference: DEX-TTS/model/retention.py:27-31."""
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack((-x2, x1), axis=-1).reshape(x.shape)


def theta_shift(x, sin, cos):
    """reference: DEX-TTS/model/retention.py:34-35."""
    return x * cos + rotate_every_two(x) * sin


def rel_pos(config: RetNetEncoderConfig, slen: int, retention_mask: jnp.ndarray):
    """Rotary sin/cos tables + decay mask for the parallel form.

    retention_mask: (B, T) 0/1. Returns (sin (T,D), cos (T,D),
    decay_mask (B, H, T, T)). reference: DEX-TTS/model/retention.py:136-161.
    """
    key_dim = config.embed_dim // config.num_heads
    angle = jnp.asarray(_rotary_angle(key_dim))
    index = jnp.arange(slen, dtype=jnp.float32)
    sin = jnp.sin(index[:, None] * angle[None, :])
    cos = jnp.cos(index[:, None] * angle[None, :])

    mask = retention_mask[:, None, :] * retention_mask[:, :, None]  # (B,T,T)
    mask = mask[:, None, :, :]  # (B,1,T,T) broadcast over heads
    if config.use_decay:
        decay = jnp.asarray(_head_decay(config.num_heads, config.use_lm_decay))
        diff = index[:, None] - index[None, :]  # i - j
        dmask = jnp.exp(diff[None, :, :] * decay[:, None, None])  # (H,T,T)
        dmask = jnp.where(mask > 0, dmask[None], 0.0)  # (B,H,T,T)
        denom = jnp.sqrt(jnp.sum(dmask, axis=-1, keepdims=True))
        dmask = jnp.where(denom > 0, dmask / denom, 0.0)
        return sin, cos, dmask
    return sin, cos, jnp.broadcast_to(
        mask, (mask.shape[0], config.num_heads, slen, slen)
    )


def recurrent_retention(q, k, v, decay):
    """O(T) recurrent form of decayed retention (the true RetNet mode).

    q, k, v: (B, H, T, D); decay: (H,) log-decay γ.
    Returns (B, H, T, D) outputs and the final state (B, H, D, D).

    Recurrence (reference: DEX-TTS/model/retention.py:99-107, carried as
    dead code there — only the parallel form is exercised by the TTS
    configs): S_t = γ·S_{t-1} + k_tᵀ v_t;  o_t = q_t · S_t.
    Implemented as a lax.scan so autoregressive serving is one compiled
    step per token with an explicit state pytree.
    """
    gamma = jnp.exp(decay)[None, :, None, None]  # (1, H, 1, 1)

    def step(state, qkv_t):
        q_t, k_t, v_t = qkv_t  # (B, H, D) each
        state = gamma * state + k_t[..., :, None] * v_t[..., None, :]
        out = jnp.einsum("bhd,bhde->bhe", q_t, state)
        return state, out

    b, h, t, d = q.shape
    init = jnp.zeros((b, h, d, d), q.dtype)
    qkv = (q.transpose(2, 0, 1, 3), k.transpose(2, 0, 1, 3), v.transpose(2, 0, 1, 3))
    state, outs = jax.lax.scan(step, init, qkv)
    return outs.transpose(1, 2, 0, 3), state


def chunkwise_retention(q, k, v, decay, chunk_size: int = 64):
    """Chunkwise-parallel decayed retention: parallel inside chunks,
    recurrent across chunks (reference: DEX-TTS/model/retention.py:108-135,
    dead code there). Equivalent to recurrent_retention; O(T·C) compute
    with MXU-shaped intra-chunk matmuls."""
    b, h, t, d = q.shape
    pad = (-t) % chunk_size
    if pad:
        pad_spec = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(a, pad_spec) for a in (q, k, v))
    n_chunks = q.shape[2] // chunk_size
    c = chunk_size
    reshape = lambda a: a.reshape(b, h, n_chunks, c, d).transpose(2, 0, 1, 3, 4)
    qc, kc, vc = reshape(q), reshape(k), reshape(v)  # (N, B, H, C, D)

    gamma = jnp.exp(decay)  # (H,)
    idx = jnp.arange(c, dtype=jnp.float32)
    # intra-chunk decay D[i, j] = γ^(i-j) for i ≥ j
    diff = idx[:, None] - idx[None, :]
    intra = jnp.where(diff >= 0, gamma[:, None, None] ** diff[None], 0.0)
    # cross-chunk scalings
    q_decay = gamma[:, None] ** (idx + 1)[None, :]  # (H, C)
    k_decay = gamma[:, None] ** (c - 1 - idx)[None, :]  # (H, C)
    cross = gamma**c

    def step(state, qkv_c):
        q_i, k_i, v_i = qkv_c  # (B, H, C, D)
        inner = jnp.einsum("bhcd,bhed->bhce", q_i, k_i) * intra[None]
        out = jnp.einsum("bhce,bhed->bhcd", inner, v_i)
        out += jnp.einsum(
            "bhcd,bhde,hc->bhce", q_i, state, q_decay
        )
        kv = jnp.einsum("bhcd,bhce,hc->bhde", k_i, v_i, k_decay)
        state = cross[None, :, None, None] * state + kv
        return state, out

    init = jnp.zeros((b, h, d, d), q.dtype)
    state, outs = jax.lax.scan(step, init, (qc, kc, vc))
    outs = outs.transpose(1, 2, 0, 3, 4).reshape(b, h, -1, d)
    return outs[:, :, :t, :], state


class MultiScaleRetention(nn.Module):
    """Parallel-form retention head. With use_softmax=True this is softmax
    attention over rotary-shifted q/k with a per-head decay/padding mask and
    a swish gate on the output.

    reference: DEX-TTS/model/retention.py:183-295.
    """

    config: RetNetEncoderConfig

    @nn.compact
    def __call__(self, x, sin, cos, decay_mask, train: bool = False):
        cfg = self.config
        b, t, _ = x.shape
        h = cfg.num_heads
        key_dim = cfg.embed_dim // h
        head_dim = cfg.value_dim // h
        scaling = key_dim**-0.5

        proj_init = nn.initializers.variance_scaling(
            2.0**-5, "fan_avg", "uniform"  # xavier_uniform, gain 2^-2.5
        )
        dense = lambda d, name: nn.Dense(
            d, use_bias=False, kernel_init=proj_init, name=name
        )
        q = dense(cfg.embed_dim, "q_proj")(x)
        k = dense(cfg.embed_dim, "k_proj")(x) * scaling
        v = dense(cfg.value_dim, "v_proj")(x)
        g = dense(cfg.value_dim, "g_proj")(x)

        split = lambda a, d: a.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        q, k = split(q, key_dim), split(k, key_dim)
        v = split(v, head_dim)

        qr = theta_shift(q, sin, cos)
        kr = theta_shift(k, sin, cos)

        scores = jnp.einsum(
            "bhtd,bhsd->bhts", qr, kr, preferred_element_type=jnp.float32
        )
        scores = scores * decay_mask
        if cfg.use_softmax:
            scores = jnp.where(decay_mask == 0, -1e4, scores)
            weights = jax.nn.softmax(scores, axis=-1)
        else:
            denom = jnp.clip(
                jnp.abs(
                    jax.lax.stop_gradient(jnp.sum(scores, axis=-1, keepdims=True))
                ),
                1.0,
                None,
            )
            weights = scores / denom
        weights = nn.Dropout(0.1, deterministic=not train)(weights)

        out = jnp.einsum(
            "bhts,bhsd->bhtd", weights, v.astype(weights.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3)  # (B, T, H, D)
        out = RMSNorm(head_dim, eps=cfg.layernorm_eps, elementwise_affine=False)(
            out
        ).reshape(b, t, cfg.value_dim)
        out = nn.silu(g) * out
        out = nn.Dense(
            cfg.value_dim,
            use_bias=False,
            kernel_init=nn.initializers.xavier_uniform(),
            name="out_proj",
        )(out)
        return out


class GLU(nn.Module):
    """Gated FFN: act(fc1(x)) * gate(x) → fc2.
    reference: DEX-TTS/model/retention.py:346-380."""

    config: RetNetEncoderConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        act = {"gelu": nn.gelu, "relu": nn.relu, "swish": nn.silu}[cfg.activation]
        g = nn.Dense(cfg.ffn_dim, use_bias=False, name="gate")(x)
        hidden = nn.Dense(cfg.ffn_dim, use_bias=False, name="fc1")(x)
        hidden = act(hidden.astype(jnp.float32)).astype(x.dtype) * g
        hidden = nn.Dropout(cfg.activation_dropout, deterministic=not train)(hidden)
        out = nn.Dense(cfg.embed_dim, use_bias=False, name="fc2")(hidden)
        return nn.Dropout(cfg.dropout, deterministic=not train)(out)


class RetNetEncoderLayer(nn.Module):
    """Pre-norm retention block with optional style AdaLN after each
    sublayer. reference: DEX-TTS/model/retention.py:397-514."""

    config: RetNetEncoderConfig
    depth: int

    @nn.compact
    def __call__(self, x, sin, cos, decay_mask, sty=None, train: bool = False):
        cfg = self.config
        drop_prob = float(
            np.linspace(0, cfg.drop_path_rate, cfg.num_layers)[self.depth]
            if cfg.drop_path_rate > 0
            else 0.0
        )

        residual = x
        h = RMSNorm(cfg.embed_dim, eps=cfg.layernorm_eps, name="retention_norm")(x)
        h = MultiScaleRetention(cfg, name="retention")(
            h, sin, cos, decay_mask, train=train
        )
        h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        h = DropPath(drop_prob)(h, train=train)
        x = residual + h
        if cfg.use_adaln:
            x = AdaptiveLayerNorm(cfg.embed_dim, name="adaln_1")(x, sty)

        residual = x
        h = RMSNorm(cfg.embed_dim, eps=cfg.layernorm_eps, name="final_norm")(x)
        h = GLU(cfg, name="ffn")(h, train=train)
        h = DropPath(drop_prob)(h, train=train)
        x = residual + h
        if cfg.use_adaln:
            x = AdaptiveLayerNorm(cfg.embed_dim, name="adaln_2")(x, sty)
        return x


class RetNetEncoder(nn.Module):
    """Layer stack + final RMSNorm.
    reference: DEX-TTS/model/retnet.py:5-184."""

    config: RetNetEncoderConfig

    @nn.compact
    def __call__(self, x, retention_mask, sty=None, train: bool = False):
        cfg = self.config
        sin, cos, decay_mask = rel_pos(cfg, x.shape[1], retention_mask)
        for i in range(cfg.num_layers):
            x = RetNetEncoderLayer(cfg, depth=i, name=f"layer_{i}")(
                x, sin, cos, decay_mask, sty=sty, train=train
            )
        return RMSNorm(cfg.embed_dim, eps=cfg.layernorm_eps, name="norm")(x)
