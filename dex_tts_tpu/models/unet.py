"""Grad-TTS-style 2-D U-Net denoiser with a DiT middle block.

reference: DEX-TTS/model/diffusion.py:11-236 (style-adapted variant) and
GeDEX-TTS/model/diffusion.py:16-207 (plain variant). Layout is NHWC:
(B, mel_bins, frames, C); masks are (B, 1, W, 1).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.models.dit import DiT, DiTConfig
from dex_tts_tpu.models.layers import SinusoidalPosEmb, mish
from dex_tts_tpu.models.ref_encoder import TIVAdaptor, TVAdaptor
from dex_tts_tpu.ops import sequence_mask


class GroupNorm(nn.Module):
    """GroupNorm whose *large-tensor* math stays in the input dtype.

    flax's nn.GroupNorm promotes the whole activation to float32 for the
    statistics; with bf16 activations that creates f32↔bf16 tiling
    boundaries that dominate runtime on v5e (measured ~5x). Here only the
    (tiny) per-group statistics are computed in f32; the normalization is
    applied in the activation dtype. torch semantics (eps inside rsqrt,
    affine per channel — reference: DEX-TTS/model/diffusion.py:48)."""

    num_groups: int = 8
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        b, h, w, _ = x.shape
        xg = x.reshape(b, h * w, g, c // g)
        xf = xg.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(xf**2, axis=(1, 3), keepdims=True) - mean**2
        inv = jax.lax.rsqrt(var + self.epsilon)
        # fold stats into per-(b, group) scale/shift, cast small, apply big
        a = inv.astype(x.dtype)
        m = (mean * inv).astype(x.dtype)
        out = (xg * a - m).reshape(b, h, w, c)
        return out * scale.astype(x.dtype) + bias.astype(x.dtype)


class Block(nn.Module):
    """conv3x3 → GroupNorm(8) → Mish, masked in/out.
    reference: DEX-TTS/model/diffusion.py:44-53."""

    dim_out: int
    groups: int = 8
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, mask):
        dt = jnp.dtype(self.dtype)
        h = nn.Conv(
            self.dim_out, (3, 3), padding=[(1, 1), (1, 1)], dtype=dt,
        )(x.astype(dt) * mask.astype(dt))
        h = GroupNorm(num_groups=self.groups, epsilon=1e-5)(h)
        return mish(h) * mask.astype(h.dtype)


class ResnetBlock(nn.Module):
    """Two Blocks with a time-embedding shift between them + 1x1 residual.
    reference: DEX-TTS/model/diffusion.py:56-74."""

    dim_out: int
    groups: int = 8
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, mask, time_emb):
        dt = jnp.dtype(self.dtype)
        x = x.astype(dt)
        mask = mask.astype(dt)
        h = Block(self.dim_out, self.groups, self.dtype, name="block1")(x, mask)
        t = nn.Dense(self.dim_out, name="mlp")(mish(time_emb))
        h = h + t[:, None, None, :].astype(dt)
        h = Block(self.dim_out, self.groups, self.dtype, name="block2")(h, mask)
        if x.shape[-1] != self.dim_out:
            res = nn.Conv(
                self.dim_out, (1, 1), dtype=dt, name="res_conv",
            )(x * mask)
        else:
            res = x * mask
        return h + res


class LinearAttention(nn.Module):
    """Efficient attention: k softmaxed over space, context = k·vᵀ, out =
    q·context. reference: DEX-TTS/model/diffusion.py:77-95.

    Layout: token-major (B, N, heads, d) end to end — contracting over N
    directly avoids materializing (B, heads, d, N) transposes of the
    ~750 MB qkv tensor; separate q/k/v projections avoid the strided slice
    of an interleaved fused qkv (measured ~1.8x at the U-Net's level-0
    shapes and ~4x at level 1 on v5e); the token softmax runs in f32 (bf16
    exp over the long token axis is the remaining cost otherwise). The
    reference's fused to_qkv weight is split at conversion time
    (convert._unet_attn), so checkpoints remain interchangeable."""

    heads: int = 4
    dim_head: int = 32
    dtype: str = "float32"
    # "tokenmajor": per-head einsums over (B, N, heads, d) intermediates.
    # "fused" (default): channels stay fused at heads·d end to end — the
    # context is one (B, C, C) matmul with the cross-head blocks zeroed by
    # a constant block-diagonal mask (exact same math per block: the extra
    # products are multiplied by 0 and summing zeros is exact in fp; only
    # f32-accumulation order differs). Kills the 32-lane-minor relayout
    # copy XLA inserts merging (heads, d) → C before to_out; the 4x
    # context-matmul FLOPs are negligible (C=128). Measured e2e on v5e
    # (scripts/perf_variants_e2e.py, 2026-08-19): 1.052x — text→mel
    # 2446.6 → 2326.0 ms at batch 16 × 768 frames (RTF 0.01715 → 0.01630).
    impl: str = "fused"

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        dt = jnp.dtype(self.dtype)
        hidden = self.heads * self.dim_head
        n = h * w
        t = x.reshape(b, n, c)
        q = nn.Dense(hidden, use_bias=False, dtype=dt, name="to_q")(t)
        k = nn.Dense(hidden, use_bias=False, dtype=dt, name="to_k")(t)
        v = nn.Dense(hidden, use_bias=False, dtype=dt, name="to_v")(t)
        if self.impl == "fused":
            # per-(head, channel) token softmax == per-channel on the
            # fused layout (each channel belongs to exactly one head)
            kf = k.astype(jnp.float32)
            kf = kf - jax.scipy.special.logsumexp(kf, axis=1, keepdims=True)
            k = jnp.exp(kf).astype(x.dtype)
            blocks = np.kron(
                np.eye(self.heads, dtype=np.float32),
                np.ones((self.dim_head, self.dim_head), np.float32),
            )
            context = jnp.einsum(
                "bnd,bne->bde", k, v, preferred_element_type=jnp.float32
            )
            context = (context * blocks).astype(x.dtype)
            out = jnp.einsum(
                "bde,bnd->bne", context, q,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        else:
            q = q.reshape(b, n, self.heads, self.dim_head)
            k = k.reshape(b, n, self.heads, self.dim_head)
            v = v.reshape(b, n, self.heads, self.dim_head)
            kf = k.astype(jnp.float32)
            kf = kf - jax.scipy.special.logsumexp(kf, axis=1, keepdims=True)
            k = jnp.exp(kf).astype(x.dtype)  # softmax over tokens
            context = jnp.einsum(
                "bnhd,bnhe->bhde", k, v, preferred_element_type=jnp.float32
            ).astype(x.dtype)
            out = jnp.einsum(
                "bhde,bnhd->bnhe", context, q,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        out = out.reshape(b, h, w, hidden)
        return nn.Conv(c, (1, 1), dtype=dt, name="to_out")(out)


class RezeroAttention(nn.Module):
    """x + g·LinearAttention(x), g zero-init.
    reference: DEX-TTS/model/diffusion.py:34-41,98-105."""

    dtype: str = "float32"
    impl: str = "fused"

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.zeros, (1,))
        return x + LinearAttention(
            dtype=self.dtype, impl=self.impl, name="fn"
        )(x) * g.astype(x.dtype)


class Downsample(nn.Module):
    """conv3x3 stride 2. reference: DEX-TTS/model/diffusion.py:25-31."""

    dim: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.dim, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            dtype=jnp.dtype(self.dtype),
        )(x)


class Upsample(nn.Module):
    """ConvTranspose k=4 s=2 p=1 (exact 2x).
    reference: DEX-TTS/model/diffusion.py:16-22."""

    dim: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        # torch ConvTranspose2d(k=4, s=2, p=1) ⇒ out = 2·in. flax explicit
        # padding counts from the VALID transposed output, so torch's p maps
        # to k-1-p = (2, 2) here (verified numerically against torch).
        return nn.ConvTranspose(
            self.dim,
            (4, 4),
            strides=(2, 2),
            padding=[(2, 2), (2, 2)],
            transpose_kernel=True,
            dtype=jnp.dtype(self.dtype),
        )(x)


class DiffusionDenoiser(nn.Module):
    """U-Net: per-resolution [2×ResnetBlock + linear attention + down/up]
    with a (style-adapted) DiT bottleneck.

    use_style=True adds the TVAdaptor→TIVAdaptor bottleneck conditioning
    (reference: DEX-TTS/model/diffusion.py:122-236); use_style=False with
    n_spks>1 instead stacks a speaker channel onto the input
    (reference: GeDEX-TTS/model/diffusion.py:168-175).
    """

    dim: int = 64
    dim_mults: Sequence[int] = (1, 2)
    groups: int = 8
    n_feats: int = 80
    pe_scale: float = 1000.0
    dit_cfg: DiTConfig = None
    use_style: bool = False
    n_spks: int = 1
    spk_emb_dim: int = 64
    dtype: str = "float32"  # compute dtype for convs/attention (params f32)
    linattn_impl: str = "fused"  # see LinearAttention.impl

    @nn.compact
    def __call__(
        self,
        x,
        mask,
        mu,
        t,
        ref=None,
        sty=None,
        sty_lengths=None,
        spk=None,
        train: bool = False,
        mask_ratio: float = 0.0,
        return_mid: bool = False,
        mid_override=None,
    ):
        """x, mu: (B, n_feats, W); mask: (B, 1, W); t: (B,) noise labels.

        ref (DEX): tuple (means, stds) each (B, L_blocks, C_mid) — stacked
        per-block stats of the TIV encoder skips.
        sty (DEX): (B, Ts, C_mid·?) decoder style sequence (channels last).
        spk (GeDEX): (B, spk_emb_dim) speaker embedding.
        Returns (B, n_feats, W).

        DiT-cache sampling hooks (edm._dit_cache_sampler): return_mid=True
        additionally returns the (adaptors+)DiT mid-block output;
        mid_override replaces it, skipping the adaptors/DiT entirely so
        only the conv U-Net path is computed. Both are trace-static.
        """
        channels = [mu, x]
        if not self.use_style and self.n_spks > 1:
            s = nn.Dense(self.spk_emb_dim * 4, name="spk_fc1")(spk)
            s = nn.Dense(self.n_feats, name="spk_fc2")(mish(s))
            channels.append(jnp.repeat(s[:, :, None], x.shape[-1], axis=-1))
        dt = jnp.dtype(self.dtype)
        h = jnp.stack(channels, axis=-1).astype(dt)  # (B, H, W, C_in)
        mask4 = mask[:, 0, :, None][:, None, :, :].astype(dt)  # (B, 1, W, 1)

        t_init = SinusoidalPosEmb(self.dim)(t, scale=self.pe_scale)
        t_unet = nn.Dense(self.dim * 4, name="time_fc1")(t_init)
        t_unet = nn.Dense(self.dim, name="time_fc2")(mish(t_unet))

        dims = [d * self.dim for d in self.dim_mults]
        num_res = len(dims)

        hiddens = []
        masks = [mask4]
        for i, dim_out in enumerate(dims):
            is_last = i == num_res - 1
            m = masks[-1]
            h = ResnetBlock(dim_out, self.groups, self.dtype,
                            name=f"down_{i}_res1")(h, m, t_unet)
            h = ResnetBlock(dim_out, self.groups, self.dtype,
                            name=f"down_{i}_res2")(h, m, t_unet)
            h = RezeroAttention(self.dtype, self.linattn_impl, name=f"down_{i}_attn")(h)
            hiddens.append(h)
            if not is_last:
                h = Downsample(dim_out, self.dtype,
                               name=f"down_{i}_downsample")(h * m)
            else:
                h = h * m
            masks.append(m[:, :, ::2, :])

        masks = masks[:-1]
        mask_mid = masks[-1]

        if mid_override is not None:
            h = mid_override.astype(dt)
        elif self.use_style:
            # time embeddings for the adaptors
            # (reference: DEX-TTS/model/diffusion.py:200-203)
            mid_dim = dims[-1]
            t_adap = nn.Dense(self.dim, name="adap_fc1")(t_init)
            t_adap = nn.Dense(mid_dim, name="adap_fc2")(mish(t_adap))
            t_sty = nn.Dense(self.dim, name="adap_sty_fc1")(t_init)
            t_sty = nn.Dense(mid_dim, name="adap_sty_fc2")(mish(t_sty))

            sty_mask = sequence_mask(sty_lengths, sty.shape[1]).astype(
                jnp.float32
            )
            # adaptors keep the mid feature in the compute dtype (their
            # norm/softmax statistics are f32 internally)
            h = TVAdaptor(name="tv_adaptor")(
                h, mask_mid, sty, sty_mask, t_sty[:, None, :]
            )
            h = TIVAdaptor(name="tiv_adaptor")(h, ref, t_adap[:, None, :])

        if mid_override is None:
            h = DiT(self.dit_cfg, name="dit")(
                h, mask_mid, t, train=train, mask_ratio=mask_ratio
            ).astype(dt)
        mid_out = h

        for j, (dim_in, m) in enumerate(
            zip(reversed(dims[:-1]), reversed(masks[1:]))
        ):
            h = jnp.concatenate([h, hiddens.pop()], axis=-1)
            h = ResnetBlock(dim_in, self.groups, self.dtype,
                            name=f"up_{j}_res1")(h, m, t_unet)
            h = ResnetBlock(dim_in, self.groups, self.dtype,
                            name=f"up_{j}_res2")(h, m, t_unet)
            h = RezeroAttention(self.dtype, self.linattn_impl, name=f"up_{j}_attn")(h)
            h = Upsample(dim_in, self.dtype, name=f"up_{j}_upsample")(h * m)

        # the first (unconsumed) skip pairs with the final blocks
        h = Block(self.dim, self.groups, self.dtype, name="final_block")(h, mask4)
        out = nn.Conv(1, (1, 1), dtype=dt, name="final_conv")(h * mask4)
        out = (out * mask4).astype(jnp.float32)
        if return_mid:
            return out[:, :, :, 0], mid_out
        return out[:, :, :, 0]
