"""Model facades: GeDEXTTS (general) and DeXTTS (expressive, reference-
speech conditioned).

reference: GeDEX-TTS/model/tts.py:15-122 and DEX-TTS/model/tts.py:14-153.

TPU-first API split (instead of the reference's dynamic-shape forward):
  encode()        — text → (mu_x, logw); used once to predict durations so
                    the host can pick a static frame bucket.
  synthesize()    — full text→mel with a *static* y_max_length; the 50-step
                    sampler is a lax.scan, everything in one jit.
  compute_loss()  — training losses with on-device MAS and segment cut.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dex_tts_tpu.models.dit import DiTConfig
from dex_tts_tpu.models.edm import SamplerConfig, ablation_sampler, edm_loss
from dex_tts_tpu.models.ref_encoder import (
    LF0Encoder,
    TIVEncoder,
    TVEncoder,
    stack_skip_stats,
)
from dex_tts_tpu.models.text_encoder import TextEncoder
from dex_tts_tpu.models.unet import DiffusionDenoiser
from dex_tts_tpu.ops import (
    duration_loss,
    generate_path,
    maximum_path,
    random_segment,
    sequence_mask,
)

LOG_2PI = math.log(2 * math.pi)


def _log_prior(y, mu_x, n_feats):
    """Frame-token Gaussian log-likelihood grid for MAS.
    y: (B, F, Ty); mu_x: (B, Tx, F) → (B, Tx, Ty).
    reference: DEX-TTS/model/tts.py:100-106."""
    y_sq = -0.5 * jnp.sum(y**2, axis=1)[:, None, :]
    y_mu = jnp.einsum("bxf,bft->bxt", mu_x, y)
    mu_sq = -0.5 * jnp.sum(mu_x**2, axis=-1)[:, :, None]
    const = -0.5 * LOG_2PI * n_feats
    return y_sq + y_mu + mu_sq + const


class GeDEXTTS(nn.Module):
    """General DEX-TTS: no reference speech; optional learned speaker-ID
    embedding. reference: GeDEX-TTS/model/tts.py:15-122."""

    n_vocab: int
    n_feats: int = 80
    n_spks: int = 1
    spk_emb_dim: int = 64
    # encoder knobs (reference: GeDEX-TTS/config/LJSpeech/base.yaml:29-39)
    enc_channels: int = 192
    enc_filter_channels: int = 1024
    enc_filter_channels_dp: int = 256
    enc_heads: int = 2
    enc_layers: int = 8
    enc_kernel: int = 3
    enc_dropout: float = 0.1
    use_softmax: bool = True
    use_decay: bool = False
    # decoder knobs
    dec_dim: int = 64
    dec_dim_mults: tuple = (1, 2)
    pe_scale: float = 1000.0
    loss_type: str = "base"
    dit: Optional[DiTConfig] = None
    # compute dtype of the denoiser hot path ("bfloat16" for serving;
    # params always float32)
    compute_dtype: str = "float32"
    # U-Net linear-attention lowering (see unet.LinearAttention.impl)
    linattn_impl: str = "fused"

    use_style: bool = False  # overridden by DeXTTS

    def setup(self):
        if self.n_spks > 1:
            self.spk_emb = nn.Embed(self.n_spks, self.spk_emb_dim)
        self.encoder = TextEncoder(
            n_vocab=self.n_vocab,
            n_feats=self.n_feats,
            n_channels=self.enc_channels,
            filter_channels=self.enc_filter_channels,
            filter_channels_dp=self.enc_filter_channels_dp,
            n_heads=self.enc_heads,
            n_layers=self.enc_layers,
            kernel_size=self.enc_kernel,
            p_dropout=self.enc_dropout,
            use_softmax=self.use_softmax,
            use_decay=self.use_decay,
            use_adaln=self.use_style,
            n_spks=self.n_spks,
            spk_emb_dim=self.spk_emb_dim,
        )
        mid_dim = self.dec_dim * self.dec_dim_mults[-1]
        dit_cfg = self.dit or DiTConfig()
        n_down = len(self.dec_dim_mults) - 1
        dit_cfg = DiTConfig(
            **{
                **dit_cfg.__dict__,
                "in_channels": mid_dim,
                "grid_h": (self.n_feats // (2**n_down)) // dit_cfg.stride_size,
                "dtype": self.compute_dtype,
            }
        )
        self.decoder = DiffusionDenoiser(
            dim=self.dec_dim,
            dim_mults=self.dec_dim_mults,
            n_feats=self.n_feats,
            pe_scale=self.pe_scale,
            dit_cfg=dit_cfg,
            use_style=self.use_style,
            n_spks=self.n_spks,
            spk_emb_dim=self.spk_emb_dim,
            # with compute_dtype="bfloat16" the whole U-Net runs bf16 —
            # including GroupNorm application (stats in f32 on tiny
            # tensors): mixed f32/bf16 islands are what trigger the slow
            # relayout path on v5e, so boundaries exist only at the DiT and
            # adaptor entry/exit.
            dtype=self.compute_dtype,
            linattn_impl=self.linattn_impl,
        )

    # -- shared pieces ------------------------------------------------------

    def _spk_vec(self, spk):
        if self.n_spks > 1:
            return self.spk_emb(spk)
        return None

    def encode(self, x, x_lengths, spk=None, train: bool = False):
        """Text → (mu_x (B,Tx,F), logw (B,Tx,1), x_mask (B,Tx,1))."""
        return self.encoder(x, x_lengths, spk=self._spk_vec(spk), train=train)

    def predict_durations(self, x, x_lengths, spk=None, **cond_inputs):
        """Small graph for phase-1 duration estimation (host picks the
        frame bucket from it). Runs the style encoders when present because
        DEX conditions the text encoder on style (AdaLN)."""
        if self.use_style:
            cond = self._cond_from_inputs(train=False, **cond_inputs)
            _, logw, x_mask = self.encoder(
                x, x_lengths, sty=cond["sty_enc"], train=False
            )
        else:
            _, logw, x_mask = self.encode(x, x_lengths, spk=spk)
        return logw, x_mask

    def _denoise_kwargs(self, spk=None, **_):
        return {"spk": self._spk_vec(spk)}

    # -- inference ----------------------------------------------------------

    def synthesize(
        self,
        key,
        x,
        x_lengths,
        y_max_length: int,
        sampler: SamplerConfig,
        temperature: float = 1.0,
        length_scale: float = 1.0,
        spk=None,
        latents_noise=None,
        **cond_inputs,
    ):
        """Full text→mel. y_max_length is static (a frame bucket ≥ the true
        Σ durations, multiple of 4). Returns (enc_out, dec_out, attn,
        y_lengths); frames past each item's length are zero.
        latents_noise: optional (B, F, y_max_length) standard-normal tensor
        replacing the key-derived initial noise (deterministic replay /
        cross-framework parity).
        reference: GeDEX-TTS/model/tts.py:27-56."""
        cond = self._cond_from_inputs(train=False, **cond_inputs)
        cond.pop("vq_loss", None)
        if self.use_style:
            mu_x, logw, x_mask = self.encoder(
                x, x_lengths, sty=cond.pop("sty_enc"), train=False
            )
        else:
            mu_x, logw, x_mask = self.encode(x, x_lengths, spk=spk)

        w = jnp.exp(logw[:, :, 0]) * x_mask[:, :, 0]
        w_ceil = jnp.ceil(w) * length_scale
        y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=1), 1.0)
        y_lengths = jnp.minimum(y_lengths, y_max_length).astype(jnp.int32)

        y_mask = sequence_mask(y_lengths, y_max_length).astype(mu_x.dtype)
        attn_mask = x_mask[:, :, 0][:, :, None] * y_mask[:, None, :]
        attn = generate_path(w_ceil, attn_mask)  # (B, Tx, Ty)

        mu_y = jnp.einsum("bxt,bxf->bft", attn, mu_x)  # (B, F, Ty)
        mask3 = y_mask[:, None, :]

        denoise_kwargs = self._denoise_kwargs(spk=spk, **cond)

        def denoise_fn(z, t, **kw):
            return self.decoder(z, mask3, mu_y, t, train=False, **kw, **denoise_kwargs)

        # DiT-cache ("turbo") sampling hooks, used only when
        # sampler.dit_cache_interval > 1 (models/edm._dit_cache_sampler)
        def denoise_fn_mid(z, t, **kw):
            return self.decoder(
                z, mask3, mu_y, t, train=False, return_mid=True,
                **kw, **denoise_kwargs,
            )

        def denoise_fn_cached(z, t, mid=None, **kw):
            return self.decoder(
                z, mask3, mu_y, t, train=False, mid_override=mid,
                **kw, **denoise_kwargs,
            )

        k_latent, k_sample = jax.random.split(key)
        noise = (
            latents_noise.astype(mu_y.dtype)
            if latents_noise is not None
            else jax.random.normal(k_latent, mu_y.shape, mu_y.dtype)
        )
        latents = noise / temperature + mu_y
        if self.is_initializing():
            # create decoder params eagerly — creating them inside the
            # sampler's lax.scan body would leak tracers out of the scan
            c_noise = jnp.zeros((x.shape[0],), mu_y.dtype)
            dec_out = denoise_fn(latents, c_noise)
        else:
            dec_out = ablation_sampler(
                k_sample, denoise_fn, latents, sampler,
                denoise_fn_mid=denoise_fn_mid,
                denoise_fn_cached=denoise_fn_cached,
            )
        return mu_y * mask3, dec_out * mask3, attn, y_lengths

    # -- training -----------------------------------------------------------

    def compute_loss(
        self,
        key,
        x,
        x_lengths,
        y,
        y_lengths,
        out_size: int | None = None,
        spk=None,
        mask_ratio: float = 0.0,
        train: bool = True,
        **cond_inputs,
    ):
        """Losses dict. y: (B, F, Ty) padded mel.
        reference: GeDEX-TTS/model/tts.py:58-122."""
        k_seg, k_diff = jax.random.split(key)
        cond = self._cond_from_inputs(train=train, **cond_inputs)
        losses = {}
        if "vq_loss" in cond:
            losses["vq_loss"] = cond.pop("vq_loss")

        if self.use_style:
            mu_x, logw, x_mask = self.encoder(
                x, x_lengths, sty=cond.pop("sty_enc"), train=train
            )
        else:
            mu_x, logw, x_mask = self.encode(x, x_lengths, spk=spk, train=train)

        y_max_length = y.shape[-1]
        y_mask = sequence_mask(y_lengths, y_max_length).astype(mu_x.dtype)
        attn_mask = x_mask[:, :, 0][:, :, None] * y_mask[:, None, :]

        log_prior = _log_prior(y, mu_x, self.n_feats)
        attn = jax.lax.stop_gradient(
            maximum_path(jax.lax.stop_gradient(log_prior), attn_mask)
        )

        logw_ = jnp.log(1e-8 + jnp.sum(attn, axis=-1))[:, :, None] * x_mask
        losses["dur_loss"] = duration_loss(logw, logw_, x_lengths)

        mask3 = y_mask[:, None, :]
        if out_size is not None and out_size < y_max_length:
            y, attn, _, mask3 = random_segment(k_seg, y, attn, y_lengths, out_size)

        mu_y = jnp.einsum("bxt,bxf->bft", attn, mu_x)

        denoise_kwargs = self._denoise_kwargs(spk=spk, **cond)

        def denoise_fn(z, t, **kw):
            return self.decoder(
                z, mask3, mu_y, t, train=train, mask_ratio=mask_ratio,
                **kw, **denoise_kwargs,
            )

        losses["diff_loss"] = edm_loss(
            k_diff,
            denoise_fn,
            y,
            mask3,
            mu_y,
            n_feats=self.n_feats,
            loss_type=self.loss_type,
        )

        prior = jnp.sum(0.5 * ((y - mu_y) ** 2 + LOG_2PI) * mask3)
        losses["prior_loss"] = prior / (jnp.sum(mask3) * self.n_feats)
        return losses

    def _cond_from_inputs(self, train: bool = False, **kwargs):
        return {}


class DeXTTS(GeDEXTTS):
    """Expressive DEX-TTS: style from a reference utterance, split into
    time-variable (VQ + cross-attn), time-invariant (adaptive instance
    norm), and lf0 paths. reference: DEX-TTS/model/tts.py:14-153.

    Inputs beyond GeDEXTTS: ref (B, F, Tr) + ref_lengths (TIV path),
    sty (B, F, Ts) + sty_lengths (TV path; same mel in practice,
    reference: DEX-TTS/src/dataset.py:41-42), lf0 (B, Tl) + lf0_lengths.
    """

    use_style: bool = True
    # style encoder knobs (reference: DEX-TTS/config/VCTK/base.yaml:29-49)
    tv_c_h: int = 128
    tv_c_out: int = 192
    tv_c_out_g: int = 192
    tv_layers: int = 6
    tv_n_emb: int = 512
    tv_commit_w: float = 0.25
    lf0_c_h: int = 192
    lf0_c_out: int = 192
    lf0_c_out_g: int = 192
    lf0_layers: int = 2
    tiv_c_h: int = 128
    tiv_c_out: int = 64
    tiv_layers: int = 6

    def setup(self):
        super().setup()
        self.tv_encoder = TVEncoder(
            c_h=self.tv_c_h,
            c_out=self.tv_c_out,
            c_out_g=self.tv_c_out_g,
            num_layer=self.tv_layers,
            n_emb=self.tv_n_emb,
            commit_w=self.tv_commit_w,
        )
        self.lf0_encoder = LF0Encoder(
            c_h=self.lf0_c_h,
            c_out=self.lf0_c_out,
            c_out_g=self.lf0_c_out_g,
            num_layer=self.lf0_layers,
        )
        self.tiv_encoder = TIVEncoder(
            c_h=self.tiv_c_h, c_out=self.tiv_c_out, num_layer=self.tiv_layers
        )
        # match TV style channels to the U-Net mid dim
        # (reference: DEX-TTS/model/tts.py:31)
        mid_dim = self.dec_dim * self.dec_dim_mults[-1]
        self.conv_sty = nn.Dense(mid_dim)

    def _cond_from_inputs(
        self,
        ref=None,
        ref_lengths=None,
        sty=None,
        sty_lengths=None,
        lf0=None,
        lf0_lengths=None,
        train: bool = False,
    ):
        """Run the three style encoders.
        reference: DEX-TTS/model/tts.py:38-51,78-92."""
        ref_t = ref.swapaxes(1, 2)  # (B, Tr, F)
        sty_t = sty.swapaxes(1, 2)
        ref_mask = sequence_mask(ref_lengths, ref_t.shape[1])[:, :, None].astype(
            ref_t.dtype
        )
        sty_mask = sequence_mask(sty_lengths, sty_t.shape[1])[:, :, None].astype(
            sty_t.dtype
        )
        lf0_mask = sequence_mask(lf0_lengths, lf0.shape[1])[:, :, None].astype(
            lf0.dtype
        )

        lf0_enc, lf0_dec = self.lf0_encoder(lf0, lf0_mask, train=train)
        sty_enc_seq, sty_dec, vq_loss = self.tv_encoder(
            sty_t, sty_mask, train=train
        )

        # global style vector: masked time-means of TV pre-VQ + lf0 features
        sty_enc = jnp.sum(sty_enc_seq, axis=1) / jnp.sum(sty_mask, axis=1)
        sty_enc = sty_enc + jnp.sum(lf0_enc, axis=1) / jnp.sum(lf0_mask, axis=1)

        # decoder style sequence: projected quantized TV + global lf0
        lf0_global = jnp.sum(lf0_dec, axis=1) / jnp.sum(lf0_mask, axis=1)
        sty_dec = sty_dec + lf0_global[:, None, :]
        sty_dec = self.conv_sty(sty_dec)  # (B, Ts, mid_dim)

        _, ref_skips = self.tiv_encoder(ref_t, ref_mask, train=train)
        ref_stats = stack_skip_stats(ref_skips)

        return {
            "sty_enc": sty_enc,
            "sty_dec": sty_dec,
            "sty_lengths": sty_lengths,
            "ref_stats": ref_stats,
            "vq_loss": vq_loss,
        }

    def _denoise_kwargs(self, spk=None, **cond):
        return {
            "ref": cond["ref_stats"],
            "sty": cond["sty_dec"],
            "sty_lengths": cond["sty_lengths"],
        }
