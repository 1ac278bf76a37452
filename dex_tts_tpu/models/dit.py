"""DiT middle block of the U-Net denoiser.

MaskDiT-derived transformer on overlapped 2-D patches of the U-Net mid
feature map (reference: DEX-TTS/model/dit.py:31-519). Layout here is NHWC
(XLA-native); tokens are row-major (freq-major, time-minor) to match the
reference's BCHW flatten order so attention sees identical token sequences.

Components:
  PatchEmbed2D   — depthwise conv(k=patch, s=stride, SAME-ish pad) → SiLU →
                   1x1 conv (reference: dit.py:31-70)
  conv time pos  — grouped conv k=conv_pos, GELU, mean over freq
                   (reference: dit.py:75-90,444-447)
  freq pos embed — learned (1, grid_h, 1, D) zeros-init (reference: dit.py:366)
  DiTBlock       — adaLN-Zero: 6-way shift/scale/gate from the timestep
                   embedding (reference: dit.py:262-284)
  FinalLayer     — adaLN + zero-init linear to stride²·C (reference: dit.py:308-326)
  MAE-style token masking for mask_ratio > 0 (reference: dit.py:139-212)
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from dex_tts_tpu.models.layers import TimestepEmbedder


@dataclass(frozen=True)
class DiTConfig:
    """reference: DEX-TTS/config/VCTK/base.yaml:71-84 (DEX: patch 3/stride 2)
    and GeDEX-TTS/config/LJSpeech/base.yaml:49-62 (patch 7/stride 4).

    dtype is the *compute* dtype of the attention/MLP matmuls (params stay
    float32; softmax/LayerNorm statistics stay float32). Convolutions are
    always float32: bf16 grouped/depthwise convs lower to a ~5x slower
    Mosaic path on v5e (measured), while bf16 attention runs near MXU peak.
    """

    in_channels: int = 128  # set to the U-Net mid dim by the denoiser
    patch_size: int = 3
    stride_size: int = 2
    overlap: bool = True
    hidden_size: int = 256
    depth: int = 4
    num_heads: int = 2
    mlp_ratio: float = 2.0
    conv_pos: int = 16
    conv_pos_groups: int = 8
    # Exact-math lowering of the grouped time-pos conv. Isolated, the
    # grouped conv runs at 3-4.5 ms at bench shapes, but the trace shows
    # the in-graph fusion at ~9.7 ms/step (XLA assigns it a 5-D split
    # layout with 32 lanes minor). "grouped" = nn.Conv's lowering;
    # "barrier" = same + optimization_barrier around the conv (forces a
    # layout boundary); "vmap" = vmap over groups of a dense CG->CG conv
    # (fastest isolated lowering); "nchw" = channels-major dimension
    # numbers (different tiling choice).
    # MEASURED in the real e2e graph (scripts/perf_variants_e2e.py,
    # v5e 2026-08-19, interleaved): barrier 1.000x, vmap 1.000x,
    # nchw 0.798x — the lowering knob does NOT move the in-graph time;
    # the ~9.7 ms is the conv itself at its ~25% structural cap
    # (32-out-channel groups), not a fixable layout artifact. "grouped"
    # stays the default; the knob remains for future-backend A/Bs.
    pos_conv_impl: str = "grouped"
    # "conv2d" (reference parity) | "conv1d" (TPU-fast opt-in variant,
    # needs training from scratch — see ConvTimePosEmbed docstring)
    pos_embed_time: str = "conv2d"
    mask_type: str = "random"
    grid_h: int = 20  # input freq bins // stride
    # lightweight DiT decoder after token unmasking (reference:
    # DEX-TTS/model/dit.py:383-398,466-477 — off in every reference config)
    use_decoder: bool = False
    dtype: str = "float32"
    # "einsum" (any backend) | "flash" | "flash_bf16" (TPU pallas kernel:
    # avoids materializing the T² score matrix in HBM; bf16 runs the
    # matmuls at MXU-native precision with f32 softmax statistics —
    # validated to ~2e-5 of the einsum path) | "auto" (pick per static
    # token count AND regime — see resolve_attention_mode)
    attention: str = "einsum"
    # v5e crossovers for "auto". Eval (forward-only): flash_bf16 measured
    # faster from 860 tokens up and tied at 512, so flip at 768. Train
    # (forward+backward): einsum measured 33% faster at 860 tokens
    # (5.59 vs 4.21 steps/s full-step) — the flash backward blocks lose
    # at short segments — but flash's ≥2.8x forward lead at ≥2560 tokens
    # dominates any backward overhead, so flip at 2048.
    auto_flash_min_tokens: int = 768
    auto_flash_min_tokens_train: int = 2048
    # flash block-size overrides (None = padding-aware auto selection).
    # Use smaller blocks (e.g. 1024/1024) when the surrounding graph pushes
    # the kernel over the 16 MiB scoped-vmem limit (seen with the BigVGAN
    # generator fused into the same jit).
    flash_block_q: int | None = None
    flash_block_k: int | None = None

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


def modulate(x, shift, scale):
    """reference: DEX-TTS/model/dit.py:72-73."""
    one = jnp.asarray(1, x.dtype)
    return x * (one + scale[:, None, :].astype(x.dtype)) + shift[
        :, None, :
    ].astype(x.dtype)


def layer_norm_f32_stats(x, eps=1e-6):
    """Affine-free LayerNorm: statistics in f32, application in x.dtype —
    avoids f32/bf16 tiling boundaries on the big token tensor (the flax
    LayerNorm promotes the whole activation)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf**2, axis=-1, keepdims=True) - mean**2
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean.astype(x.dtype)) * inv.astype(x.dtype)


class PatchEmbed2D(nn.Module):
    """Overlapped patch embedding. x: (B, H, W, C) → (B, H', W', D)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        p, s = cfg.patch_size, cfg.stride_size
        pad = p // 2 if cfg.overlap else 0
        stride = s if cfg.overlap else p
        dt = cfg.compute_dtype
        x = nn.Conv(
            features=x.shape[-1],
            kernel_size=(p, p),
            strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=x.shape[-1],
            dtype=dt,
            name="dw_conv",
        )(x.astype(dt))
        x = nn.silu(x)
        return nn.Conv(
            cfg.hidden_size, kernel_size=(1, 1), dtype=dt, name="pw_conv"
        )(x)


class GroupedPosConv2D(nn.Module):
    """Grouped k×k conv with a selectable exact-math lowering.

    The parameter tree matches ``nn.Conv`` exactly ({kernel: (K, K, C/G,
    C), bias: (C,)}, lecun-normal/zeros init) so checkpoints are
    interchangeable across ``impl`` values — the knob only changes how
    XLA lowers the same math (see DiTConfig.pos_conv_impl).
    """

    features: int
    kernel: int
    groups: int
    padding: tuple  # ((lo, hi), (lo, hi))
    dtype: jnp.dtype
    impl: str = "grouped"

    IMPLS = ("grouped", "barrier", "vmap", "nchw")

    @nn.compact
    def __call__(self, x):  # (B, H', W', C)
        if self.impl not in self.IMPLS:
            raise ValueError(
                f"GroupedPosConv2D.impl={self.impl!r} not in {self.IMPLS}"
            )
        k, g, c = self.kernel, self.groups, self.features
        cg = c // g
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, cg, c)
        )
        bias = self.param("bias", nn.initializers.zeros, (c,))
        dt = self.dtype
        x = x.astype(dt)
        w = kernel.astype(dt)
        dn = ("NHWC", "HWIO", "NHWC")
        if self.impl == "vmap":
            b_, h_, w_in, _ = x.shape
            xg = x.reshape(b_, h_, w_in, g, cg)
            wg = w.reshape(k, k, cg, g, cg)

            def one(xs, ws):
                return jax.lax.conv_general_dilated(
                    xs, ws, (1, 1), self.padding, dimension_numbers=dn
                )

            out = jax.vmap(one, in_axes=(3, 3), out_axes=3)(xg, wg)
            out = out.reshape(b_, h_, w_in, c)
        elif self.impl == "nchw":
            # channels-major lowering: forces XLA to pick a different
            # conv tiling than the NHWC 5-D "32 lanes minor" split layout
            out = jax.lax.conv_general_dilated(
                jnp.transpose(x, (0, 3, 1, 2)),
                jnp.transpose(w, (3, 2, 0, 1)),
                (1, 1),
                self.padding,
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=g,
            )
            out = jnp.transpose(out, (0, 2, 3, 1))
        else:
            if self.impl == "barrier":
                x = jax.lax.optimization_barrier(x)
            out = jax.lax.conv_general_dilated(
                x,
                w,
                (1, 1),
                self.padding,
                dimension_numbers=dn,
                feature_group_count=g,
            )
            if self.impl == "barrier":
                out = jax.lax.optimization_barrier(out)
        return out + bias.astype(dt)


class ConvTimePosEmbed(nn.Module):
    """Grouped-conv relative position over time, averaged across freq.
    reference: DEX-TTS/model/dit.py:75-90 (make_conv_pos + SamePad).

    Two variants via DiTConfig.pos_embed_time:
      "conv2d" (default) — the reference's k×k grouped conv over the
        (freq, time) patch grid, GELU, then mean over freq. Bit-parity
        with reference checkpoints, but it is the single largest op in
        the sampler loop (~9.7 ms/step at bench shapes) and sits at its
        ~25% structural MXU cap (32-out-channel groups) — every
        exact-math lowering measured 1.000x or worse
        (scripts/perf_variants_e2e.py).
      "conv1d" — mean over freq FIRST, then a k grouped 1-D conv over
        time, GELU. ~k× (16×) fewer FLOPs for a positional signal that
        is broadcast over freq anyway. DIFFERENT MATH (mean∘gelu∘conv2d
        ≠ gelu∘conv1d∘mean): an opt-in architecture variant for models
        trained from scratch on TPU, NOT checkpoint-compatible with the
        reference (distinct param name `pos_conv1d` so a converted
        checkpoint fails loudly instead of silently mismatching).
    """

    cfg: DiTConfig

    VARIANTS = ("conv2d", "conv1d")

    @nn.compact
    def __call__(self, x):  # (B, H', W', D)
        if self.cfg.pos_embed_time not in self.VARIANTS:
            raise ValueError(
                f"pos_embed_time={self.cfg.pos_embed_time!r} "
                f"not in {self.VARIANTS}"
            )
        k = self.cfg.conv_pos
        if self.cfg.pos_embed_time == "conv1d":
            dt = self.cfg.compute_dtype
            trim = 1 if k % 2 == 0 else 0
            xm = jnp.mean(x.astype(dt), axis=1)  # (B, W', D)
            pos = nn.Conv(
                features=self.cfg.hidden_size,
                kernel_size=(k,),
                padding=[(k // 2, k // 2 - trim)],
                feature_group_count=self.cfg.conv_pos_groups,
                dtype=dt,
                name="pos_conv1d",
            )(xm)
            return nn.gelu(pos, approximate=False)[:, None, :, :]
        # torch pads k//2 both sides then trims one trailing element per dim
        # for even k (SamePad) — same as asymmetric (k//2, k//2 - 1) padding.
        trim = 1 if k % 2 == 0 else 0
        conv = GroupedPosConv2D(
            features=self.cfg.hidden_size,
            kernel=k,
            groups=self.cfg.conv_pos_groups,
            padding=((k // 2, k // 2 - trim), (k // 2, k // 2 - trim)),
            dtype=self.cfg.compute_dtype,
            impl=self.cfg.pos_conv_impl,
            name="pos_conv",
        )
        pos = nn.gelu(conv(x.astype(self.cfg.compute_dtype)), approximate=False)
        return jnp.mean(pos, axis=1, keepdims=True)  # mean over freq


class ConvTokenPosEmbed(nn.Module):
    """1-D grouped-conv relative position over the token axis, averaged
    across channels — the decoder-side positional embedding.
    reference: DEX-TTS/model/dit.py:92-117 (make_1dconv_pos + SamePad1d)
    and :466-477 (forward_decoder: pos.mean(dim=1) broadcast over D)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, tokens):  # (B, N, D)
        k = self.cfg.conv_pos
        trim = 1 if k % 2 == 0 else 0
        pos = nn.Conv(
            features=self.cfg.hidden_size,
            kernel_size=(k,),
            padding=[(k // 2, k // 2 - trim)],
            feature_group_count=self.cfg.conv_pos_groups,
            dtype=self.cfg.compute_dtype,
            name="pos_conv",
        )(tokens.astype(self.cfg.compute_dtype))
        pos = nn.gelu(pos, approximate=False)
        return jnp.mean(pos, axis=-1, keepdims=True)  # (B, N, 1)


def resolve_attention_mode(
    cfg: DiTConfig, n_tokens: int, train: bool = False
) -> str:
    """Static (trace-time) attention-kernel choice for ``attention="auto"``.

    Training's short crops (~172 frames → ~860 tokens) run einsum — the
    tiny T² softmax plus cheap backward beats the flash kernel's block
    overhead (measured 5.59 vs 4.21 steps/s at the ESD config); long
    inference buckets (768 frames → ~3840 tokens) flip to the pallas
    flash_bf16 kernel (measured RTF 0.0215 → 0.0183). The crossover sits
    higher when the program is differentiated, hence the per-regime
    thresholds. n_tokens is a static shape under jit, so this is a
    per-bucket compile-time choice, not a runtime branch.
    """
    if cfg.attention != "auto":
        return cfg.attention
    threshold = (
        cfg.auto_flash_min_tokens_train if train else cfg.auto_flash_min_tokens
    )
    return "flash_bf16" if n_tokens >= threshold else "einsum"


class MHSA(nn.Module):
    """timm-style multi-head self-attention (qkv bias, scaled dot product,
    output projection). Manual einsums: bf16 matmuls on the MXU, f32
    softmax. reference: timm Attention used at DEX-TTS/model/dit.py:270."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        b, t, d = x.shape
        h = cfg.num_heads
        hd = d // h
        dt = cfg.compute_dtype
        qkv = nn.Dense(3 * d, use_bias=True, dtype=dt, name="qkv")(x)
        qkv = qkv.reshape(b, t, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        on_tpu = jax.default_backend() == "tpu"
        mode = resolve_attention_mode(cfg, t, train)
        # pallas TPU kernels; einsum fallback elsewhere (e.g. CPU tests)
        if mode.startswith("splash") and on_tpu:
            out = self._splash(q, k, v, hd, mode)
        elif mode.startswith("flash") and on_tpu:
            out = self._flash(q, k, v, hd, mode)
        else:
            scores = jnp.einsum(
                "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            weights = jax.nn.softmax(scores, axis=-1).astype(dt)
            out = jnp.einsum(
                "bhts,bshd->bthd", weights, v, preferred_element_type=jnp.float32
            ).astype(dt)
        return nn.Dense(d, use_bias=True, dtype=dt, name="proj")(
            out.reshape(b, t, d)
        )

    def _splash(self, q, k, v, hd, mode):
        """Splash-attention pallas kernel (newer than flash_attention;
        measured ~2.3x faster at the DiT shapes on v5e with 1024/1024
        blocks — larger blocks exceed the 16 MiB scoped-vmem limit).
        Bucket padding is masked exactly via segment ids."""
        from jax.experimental.pallas.ops.tpu import splash_attention as sa

        b, t, heads = q.shape[0], q.shape[1], q.shape[2]
        dt = jnp.bfloat16 if mode == "splash_bf16" else jnp.float32
        import math

        blk_q = self.cfg.flash_block_q or 1024
        blk_kv = self.cfg.flash_block_k or blk_q
        mult = blk_q * blk_kv // math.gcd(blk_q, blk_kv)
        t_pad = -(-t // 128) * 128 if t < mult else -(-t // mult) * mult
        blk_q = min(blk_q, t_pad)
        blk_kv = min(blk_kv, t_pad)
        pad = t_pad - t

        def prep(a):
            a = a.transpose(0, 2, 1, 3).astype(dt)  # (B, H, T, D)
            return jnp.pad(a, ((0, 0), (0, 0), (0, pad), (0, 0)))

        mask = sa.MultiHeadMask([sa.FullMask((t_pad, t_pad))] * heads)
        kernel = sa.make_splash_mha(
            mask,
            head_shards=1,
            q_seq_shards=1,
            block_sizes=sa.BlockSizes(
                block_q=blk_q, block_kv=blk_kv, block_kv_compute=blk_kv,
                block_q_dkv=blk_q, block_kv_dkv=blk_kv,
                block_kv_dkv_compute=blk_kv, block_q_dq=blk_q,
                block_kv_dq=blk_kv,
            ),
        )
        seg1 = (jnp.arange(t_pad) >= t).astype(jnp.int32)
        sseg = sa.SegmentIds(q=seg1, kv=seg1)
        scale = jnp.asarray(hd**-0.5, dt)
        out = jax.vmap(
            lambda qq, kk, vv: kernel(qq * scale, kk, vv, segment_ids=sseg)
        )(prep(q), prep(k), prep(v))
        return out[:, :, :t, :].transpose(0, 2, 1, 3).astype(q.dtype)

    def _flash(self, q, k, v, hd, mode):
        """Pallas TPU flash attention; pads T to a block multiple and masks
        the padding via segment ids (exact — padded keys get zero weight)."""
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
            flash_attention,
        )

        b, t = q.shape[0], q.shape[1]
        to_bhtd = lambda a: a.transpose(0, 2, 1, 3)
        dt = jnp.bfloat16 if mode == "flash_bf16" else jnp.float32
        # tuned on v5e at ~4-5k tokens: 1024-blocks measure identical to the
        # old (2048, 1024) config inside the full graph, and 2048 q-blocks
        # overflow the 16 MiB scoped-vmem budget whenever the surrounding
        # graph is large (batch 32, or BigVGAN fused) — so 1024 is the
        # default; override via flash_block_q/k. T pads to a multiple of the
        # larger block (powers of two, so max == lcm); pick the largest
        # block_q with the least padding — attention cost scales with
        # t_pad², so waste dominates block-size micro-effects.
        block_k = 1024 if t >= 1024 else 512
        best = None
        for bq in (1024, 512):
            mult = max(bq, block_k)
            tp = -(-t // mult) * mult
            key_ = (tp, -bq)  # least padding, then largest block
            if best is None or key_ < best[0]:
                best = (key_, bq, tp)
        _, block_q, t_pad = best
        if self.cfg.flash_block_q or self.cfg.flash_block_k:
            import math

            block_q = self.cfg.flash_block_q or block_q
            block_k = self.cfg.flash_block_k or block_k
            # overrides may be arbitrary multiples of 128, so pad to the
            # true lcm (max == lcm only for the power-of-two auto path)
            mult = block_q * block_k // math.gcd(block_q, block_k)
            t_pad = -(-t // mult) * mult
        pad = t_pad - t

        def prep(a):
            a = to_bhtd(a).astype(dt)
            return jnp.pad(a, ((0, 0), (0, 0), (0, pad), (0, 0)))

        seg = (jnp.arange(t_pad) >= t).astype(jnp.int32)[None].repeat(b, 0)
        out = flash_attention(
            prep(q),
            prep(k),
            prep(v),
            segment_ids=SegmentIds(q=seg, kv=seg),
            sm_scale=hd**-0.5,
            block_sizes=BlockSizes(
                block_q=block_q,
                block_k_major=block_k,
                block_k=block_k,
                block_b=1,
                # backward blocks (required when the program is
                # differentiated, i.e. flash attention in the train step)
                block_q_major_dkv=block_q,
                block_q_dkv=block_q,
                block_k_major_dkv=block_k,
                block_k_dkv=block_k,
                block_q_dq=block_q,
                block_k_major_dq=block_k,
                block_k_dq=block_k,
            ),
        )
        return out[:, :, :t, :].transpose(0, 2, 1, 3).astype(q.dtype)


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block; attention is timm-style MHSA with qkv
    bias. reference: DEX-TTS/model/dit.py:262-284."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, c, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        mod = nn.Dense(
            6 * cfg.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="adaLN_modulation",
        )(nn.silu(c))
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp) = jnp.split(
            mod, 6, axis=-1
        )

        h = layer_norm_f32_stats(x)
        h = modulate(h, shift_msa, scale_msa)
        attn = MHSA(cfg, name="attn")(h, train)
        x = x + gate_msa[:, None, :].astype(x.dtype) * attn.astype(x.dtype)

        h = layer_norm_f32_stats(x)
        h = modulate(h, shift_mlp, scale_mlp)
        h = nn.Dense(int(cfg.hidden_size * cfg.mlp_ratio), dtype=dt, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=dt, name="mlp_fc2")(h)
        return x + gate_mlp[:, None, :].astype(x.dtype) * h.astype(x.dtype)


class FinalLayer(nn.Module):
    """adaLN + zero-init linear to stride²·C patches.
    reference: DEX-TTS/model/dit.py:308-326,404-407."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, c):
        cfg = self.cfg
        mod = nn.Dense(
            2 * cfg.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="adaLN_modulation",
        )(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = layer_norm_f32_stats(x)
        x = modulate(x, shift, scale)
        out_dim = cfg.stride_size**2 * cfg.in_channels
        return nn.Dense(
            out_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=cfg.compute_dtype,
            name="linear",
        )(x)


def token_mask(key, batch: int, length: int, mask_ratio: float):
    """MAE-style random keep/restore index sets (static keep count).
    reference: DEX-TTS/model/dit.py:139-157."""
    len_keep = int(length * (1 - mask_ratio))
    noise = jax.random.uniform(key, (batch, length))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    return ids_shuffle[:, :len_keep], ids_restore


class DiT(nn.Module):
    """The full middle block: patchify → pos embeds → blocks → final →
    unpatchify → crop/mask. reference: DEX-TTS/model/dit.py:328-519."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, mask, t, train: bool = False, mask_ratio: float = 0.0):
        """x: (B, H, W, C) mid feature, mask: (B, 1, W, 1) binary,
        t: (B,) noise-level embedding input (c_noise)."""
        cfg = self.cfg
        b, h_in, w_in, c_in = x.shape

        # pad time axis to a multiple of patch_size (reference: dit.py:434-439)
        p = cfg.patch_size
        w_pad = (-w_in) % p
        x = jnp.pad(x, ((0, 0), (0, 0), (0, w_pad), (0, 0)))

        x = PatchEmbed2D(cfg, name="x_embedder")(x)  # (B, H', W', D)
        hp, wp = x.shape[1], x.shape[2]

        t_emb = TimestepEmbedder(cfg.hidden_size, name="t_embedder")(t)

        time_pos = ConvTimePosEmbed(cfg, name="time_pos")(x)
        x = x + time_pos[:, :, : x.shape[2], :].astype(x.dtype)
        freq_pos = self.param(
            "freq_pos_embed",
            nn.initializers.zeros,
            (1, cfg.grid_h, 1, cfg.hidden_size),
        )
        x = x + freq_pos.astype(x.dtype)
        tokens = x.reshape(b, hp * wp, cfg.hidden_size)  # freq-major order

        use_mask = train and mask_ratio > 0
        if use_mask:
            key = self.make_rng("dropout")
            ids_keep, ids_restore = token_mask(key, b, hp * wp, mask_ratio)
            tokens = jnp.take_along_axis(tokens, ids_keep[:, :, None], axis=1)

        for i in range(cfg.depth):
            tokens = DiTBlock(cfg, name=f"block_{i}")(tokens, t_emb, train)

        if use_mask:
            # re-insert zero tokens at masked positions (reference: dit.py:200-206)
            n_masked = hp * wp - tokens.shape[1]
            filler = jnp.zeros((b, n_masked, tokens.shape[2]), tokens.dtype)
            tokens = jnp.concatenate([tokens, filler], axis=1)
            tokens = jnp.take_along_axis(tokens, ids_restore[:, :, None], axis=1)

        if cfg.use_decoder:
            # lightweight decoder over the unmasked token sequence
            # (reference: dit.py:505-506,466-477)
            pos = ConvTokenPosEmbed(cfg, name="decoder_pos_conv")(tokens)
            tokens = tokens + pos.astype(tokens.dtype)
            for i in range(cfg.depth):
                tokens = DiTBlock(cfg, name=f"decoder_block_{i}")(
                    tokens, t_emb, train
                )

        out = FinalLayer(cfg, name="final_layer")(tokens, t_emb)  # (B,N,s²C)

        # unpatchify (reference: dit.py:452-457): tokens row-major over
        # (grid_h, wp); each token is an (s, s, C) tile.
        s = cfg.stride_size
        out = out.reshape(b, cfg.grid_h, wp, s, s, c_in)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, cfg.grid_h * s, wp * s, c_in
        )
        out = out[:, :h_in, :w_in, :]
        return out * mask
