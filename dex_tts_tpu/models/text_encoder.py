"""Text encoder: symbol embedding → conv prenet → retention encoder →
mel-prior projection + duration predictor.

reference: DEX-TTS/model/text_encoder.py:94-143 (style-conditioned) and
GeDEX-TTS/model/text_encoder.py:131-146 (speaker-embedding concat variant).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dex_tts_tpu.models.layers import ConvReluNorm, DurationPredictor
from dex_tts_tpu.models.retention import RetNetEncoder, RetNetEncoderConfig
from dex_tts_tpu.ops import sequence_mask


class TextEncoder(nn.Module):
    n_vocab: int
    n_feats: int = 80
    n_channels: int = 192
    filter_channels: int = 1024
    filter_channels_dp: int = 256
    n_heads: int = 2
    n_layers: int = 8
    kernel_size: int = 3
    p_dropout: float = 0.1
    use_softmax: bool = True
    use_decay: bool = False
    use_adaln: bool = False  # True for DEX (style vector conditions layers)
    n_spks: int = 1
    spk_emb_dim: int = 64

    @nn.compact
    def __call__(self, x, x_lengths, sty=None, spk=None, train: bool = False):
        """x: (B, Tx) int32 token ids. Returns (mu_x (B, Tx, n_feats),
        logw (B, Tx, 1), x_mask (B, Tx, 1))."""
        emb = nn.Embed(
            self.n_vocab,
            self.n_channels,
            embedding_init=nn.initializers.normal(self.n_channels**-0.5),
            name="emb",
        )(x)
        h = emb * jnp.sqrt(float(self.n_channels))
        x_mask = sequence_mask(x_lengths, x.shape[1])[:, :, None].astype(h.dtype)

        h = ConvReluNorm(
            hidden_channels=self.n_channels,
            out_channels=self.n_channels,
            kernel_size=5,
            n_layers=3,
            p_dropout=0.5,
            name="prenet",
        )(h, x_mask, train=train)

        width = self.n_channels + (self.spk_emb_dim if self.n_spks > 1 else 0)
        if self.n_spks > 1:
            h = jnp.concatenate(
                [h, jnp.repeat(spk[:, None, :], h.shape[1], axis=1)], axis=-1
            )

        cfg = RetNetEncoderConfig(
            embed_dim=width,
            value_dim=width,
            ffn_dim=self.filter_channels,
            num_layers=self.n_layers,
            num_heads=self.n_heads,
            dropout=self.p_dropout,
            use_softmax=self.use_softmax,
            use_decay=self.use_decay,
            use_adaln=self.use_adaln,
        )
        h = RetNetEncoder(cfg, name="encoder")(
            h, x_mask[:, :, 0], sty=sty, train=train
        )
        h = h * x_mask

        mu = nn.Dense(self.n_feats, name="proj_m")(h) * x_mask
        logw = DurationPredictor(
            filter_channels=self.filter_channels_dp,
            kernel_size=self.kernel_size,
            p_dropout=self.p_dropout,
            name="proj_w",
        )(jax.lax.stop_gradient(h), x_mask, train=train)
        return mu, logw, x_mask
