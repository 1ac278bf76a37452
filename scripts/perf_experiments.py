"""TPU perf experiments toward the ≤0.02 end-to-end RTF target.

Each experiment is a separate jit with random jit-argument inputs and
scalar materialization per iteration. Run: python scripts/perf_experiments.py
[--exp vocoder|unroll|linattn|all]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

B, TY = 16, 768


from dex_tts_tpu.utils.timing import time_fn as timeit


def exp_vocoder():
    """HiFi-GAN f32 vs bf16 conv stack: time + max rel wav error."""
    from dex_tts_tpu.models.vocoder import HiFiGANConfig, HiFiGANGenerator

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, 80, TY)), jnp.float32)
    f32 = HiFiGANGenerator(HiFiGANConfig(dtype="float32"))
    bf16 = HiFiGANGenerator(HiFiGANConfig(dtype="bfloat16"))
    params = jax.jit(lambda: f32.init(jax.random.PRNGKey(0), mel[:1, :, :16]))()

    run_f32 = jax.jit(lambda p, m: f32.apply(p, m))
    run_bf16 = jax.jit(lambda p, m: bf16.apply(p, m))
    t_f32 = timeit(run_f32, params, mel)
    t_bf16 = timeit(run_bf16, params, mel)
    w32 = np.asarray(run_f32(params, mel))
    wbf = np.asarray(run_bf16(params, mel))
    err = np.abs(w32 - wbf).max()
    mae = np.abs(w32 - wbf).mean()
    print(f"vocoder f32:  {t_f32*1e3:.1f} ms   bf16: {t_bf16*1e3:.1f} ms "
          f"({t_f32/t_bf16:.2f}x)  max|Δwav|={err:.4f} mae={mae:.5f}")


def exp_unroll():
    """Sampler scan unroll factor on the full text→mel graph."""
    from __graft_entry__ import _full_size_dex, _style_inputs
    from dex_tts_tpu.models.edm import SamplerConfig
    from dex_tts_tpu.models.tts import DeXTTS

    model = _full_size_dex()
    tx, t_ref = 96, 256
    x = jnp.asarray(np.random.default_rng(1).integers(1, 148, (B, tx)), jnp.int32)
    x_lengths = jnp.full((B,), tx, jnp.int32)
    style = _style_inputs(B, 80, t_ref)

    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jax.random.PRNGKey(2), x, x_lengths, y_max_length=TY,
            sampler=SamplerConfig(num_steps=2), **style,
            method=DeXTTS.synthesize,
        )
    )()

    for unroll in (1, 2, 5):
        @jax.jit
        def synth(variables, key, x, x_lengths, ref, ref_lengths, sty,
                  sty_lengths, lf0, lf0_lengths, _u=unroll):
            return model.apply(
                variables, key, x, x_lengths, y_max_length=TY,
                sampler=SamplerConfig(num_steps=50, unroll=_u),
                temperature=1.5, ref=ref, ref_lengths=ref_lengths, sty=sty,
                sty_lengths=sty_lengths, lf0=lf0, lf0_lengths=lf0_lengths,
                method=DeXTTS.synthesize,
            )[1]

        t = timeit(synth, variables, jax.random.PRNGKey(3), x, x_lengths,
                   style["ref"], style["ref_lengths"], style["sty"],
                   style["sty_lengths"], style["lf0"], style["lf0_lengths"])
        audio = B * TY * 256 / 22050
        print(f"unroll={unroll}: {t:.3f} s  RTF={t/audio:.5f}")


class LinearAttentionNoTranspose(nn.Module):
    """Layout experiment: keep (B, N, H, D) token-major layout end-to-end;
    contract over N directly instead of materializing (B, H, D, N)."""

    heads: int = 4
    dim_head: int = 32
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        dt = jnp.dtype(self.dtype)
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=dt,
                      name="to_qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)
        k = nn.softmax(k, axis=1)  # over tokens
        context = jnp.einsum(
            "bnhd,bnhe->bhde", k, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = jnp.einsum(
            "bhde,bnhd->bnhe", context, q, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.reshape(b, h, w, hidden)
        return nn.Conv(c, (1, 1), dtype=dt, name="to_out")(out)


def exp_linattn():
    from dex_tts_tpu.models.unet import LinearAttention

    rng = np.random.default_rng(0)
    for (hh, ww, cc) in ((80, TY, 64), (40, TY // 2, 128)):
        x = jnp.asarray(rng.standard_normal((B, hh, ww, cc)), jnp.bfloat16)
        cur = LinearAttention(dtype="bfloat16")
        new = LinearAttentionNoTranspose(dtype="bfloat16")
        pc = jax.jit(lambda: cur.init(jax.random.PRNGKey(0), x))()
        pn = jax.jit(lambda: new.init(jax.random.PRNGKey(0), x))()
        t_cur = timeit(jax.jit(lambda p, a: cur.apply(p, a)), pc, x)
        t_new = timeit(jax.jit(lambda p, a: new.apply(p, a)), pn, x)
        print(f"linattn {hh}x{ww}x{cc}: current {t_cur*1e3:.2f} ms  "
              f"no-transpose {t_new*1e3:.2f} ms")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", default="all")
    args = p.parse_args()
    if args.exp in ("vocoder", "all"):
        exp_vocoder()
    if args.exp in ("linattn", "all"):
        exp_linattn()
    if args.exp in ("linattn2",):
        exp_linattn2()
    if args.exp in ("dit",):
        exp_dit()
    if args.exp in ("dit2",):
        exp_dit2()
    if args.exp in ("splash",):
        exp_splash()
    if args.exp in ("flashb",):
        exp_flashb()
    if args.exp in ("bigvgan",):
        exp_bigvgan()
    if args.exp in ("unroll", "all"):
        exp_unroll()




class LinAttnV(nn.Module):
    """Variant sweep for LinearAttention: f32 softmax, separate projections,
    layout choices."""

    variant: str = "v1"
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        dt = jnp.bfloat16
        hidden = self.heads * self.dim_head
        n = h * w
        if self.variant in ("v1", "v2"):
            # fused qkv conv, (B,H,D,N) layout like current; v1 = f32 softmax
            qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=dt,
                          name="to_qkv")(x)
            qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
            q = qkv[:, :, 0].transpose(0, 2, 3, 1)
            k = qkv[:, :, 1].transpose(0, 2, 3, 1)
            v = qkv[:, :, 2].transpose(0, 2, 3, 1)
            if self.variant == "v1":
                k = jax.nn.softmax(k.astype(jnp.float32), axis=-1).astype(dt)
            else:
                k = nn.softmax(k, axis=-1)
            context = jnp.einsum("bhdn,bhen->bhde", k, v,
                                 preferred_element_type=jnp.float32).astype(dt)
            out = jnp.einsum("bhde,bhdn->bhen", context, q,
                             preferred_element_type=jnp.float32).astype(dt)
            out = out.transpose(0, 3, 1, 2).reshape(b, h, w, hidden)
        elif self.variant == "v3":
            # separate projections as dense over tokens, N-major, f32 softmax
            t = x.reshape(b, n, c)
            q = nn.Dense(hidden, use_bias=False, dtype=dt, name="q")(t)
            k = nn.Dense(hidden, use_bias=False, dtype=dt, name="k")(t)
            v = nn.Dense(hidden, use_bias=False, dtype=dt, name="v")(t)
            q = q.reshape(b, n, self.heads, self.dim_head)
            k = k.reshape(b, n, self.heads, self.dim_head)
            v = v.reshape(b, n, self.heads, self.dim_head)
            kf = k.astype(jnp.float32)
            kf = kf - jax.scipy.special.logsumexp(kf, axis=1, keepdims=True)
            k = jnp.exp(kf).astype(dt)
            context = jnp.einsum("bnhd,bnhe->bhde", k, v,
                                 preferred_element_type=jnp.float32).astype(dt)
            out = jnp.einsum("bhde,bnhd->bnhe", context, q,
                             preferred_element_type=jnp.float32).astype(dt)
            out = out.reshape(b, h, w, hidden)
        return nn.Conv(c, (1, 1), dtype=dt, name="to_out")(out)


def exp_linattn2():
    rng = np.random.default_rng(0)
    for (hh, ww, cc) in ((80, TY, 64), (40, TY // 2, 128)):
        x = jnp.asarray(rng.standard_normal((B, hh, ww, cc)), jnp.bfloat16)
        for var in ("v1", "v2", "v3"):
            m = LinAttnV(variant=var)
            p = jax.jit(lambda m=m: m.init(jax.random.PRNGKey(0), x))()
            t = timeit(jax.jit(lambda p, a, m=m: m.apply(p, a)), p, x)
            print(f"linattn {hh}x{ww}x{cc} {var}: {t*1e3:.2f} ms")




def exp_dit():
    """DiT sub-parts at bench shapes: patchify, pos conv, one block
    (flash vs einsum), final layer."""
    from dex_tts_tpu.models.dit import (
        ConvTimePosEmbed,
        DiTBlock,
        DiTConfig,
        FinalLayer,
        PatchEmbed2D,
    )

    rng = np.random.default_rng(0)
    cfg = DiTConfig(
        in_channels=128, patch_size=3, stride_size=2, hidden_size=256,
        depth=4, num_heads=2, mlp_ratio=2.0, conv_pos=16, conv_pos_groups=8,
        grid_h=20, dtype="bfloat16", attention="flash_bf16",
    )
    x_mid = jnp.asarray(rng.standard_normal((B, 40, TY // 2, 128)), jnp.bfloat16)

    pe = PatchEmbed2D(cfg)
    p = jax.jit(lambda: pe.init(jax.random.PRNGKey(0), x_mid))()
    print(f"patchify:   {timeit(jax.jit(lambda p, a: pe.apply(p, a)), p, x_mid)*1e3:.2f} ms")

    tok_grid = jnp.asarray(
        rng.standard_normal((B, 20, TY // 4, 256)), jnp.bfloat16
    )
    pc = ConvTimePosEmbed(cfg)
    p = jax.jit(lambda: pc.init(jax.random.PRNGKey(0), tok_grid))()
    print(f"pos conv:   {timeit(jax.jit(lambda p, a: pc.apply(p, a)), p, tok_grid)*1e3:.2f} ms")

    tokens = tok_grid.reshape(B, -1, 256)
    temb = jnp.asarray(rng.standard_normal((B, 256)), jnp.float32)
    for attn in ("flash_bf16", "einsum"):
        c2 = DiTConfig(**{**cfg.__dict__, "attention": attn})
        blk = DiTBlock(c2)
        p = jax.jit(lambda blk=blk: blk.init(jax.random.PRNGKey(0), tokens, temb))()
        t = timeit(jax.jit(lambda p, a, b, blk=blk: blk.apply(p, a, b)), p, tokens, temb)
        print(f"block[{attn}]: {t*1e3:.2f} ms")

    fl = FinalLayer(cfg)
    p = jax.jit(lambda: fl.init(jax.random.PRNGKey(0), tokens, temb))()
    print(f"final:      {timeit(jax.jit(lambda p, a, b: fl.apply(p, a, b)), p, tokens, temb)*1e3:.2f} ms")




def exp_dit2():
    """pos-conv dtype variants + flash attention block sizes that divide
    3840 exactly (zero padding) vs the power-of-two defaults."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.standard_normal((B, 20, TY // 4, 256)), jnp.bfloat16)

    # grouped 16x16 pos conv: f32 (current) vs bf16 vs smaller kernel dims
    for dt, label in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        conv = nn.Conv(256, (16, 16), padding=[(8, 7), (8, 7)],
                       feature_group_count=8, dtype=dt)
        p = jax.jit(lambda conv=conv: conv.init(jax.random.PRNGKey(0), grid.astype(dt)))()
        f = jax.jit(lambda p, a, conv=conv, dt=dt: jnp.mean(
            nn.gelu(conv.apply(p, a.astype(dt)), approximate=False), axis=1, keepdims=True))
        print(f"posconv {label}: {timeit(f, p, grid)*1e3:.2f} ms")

    # depthwise (groups=256) comparison — is groups=8 the problem?
    conv = nn.Conv(256, (16, 16), padding=[(8, 7), (8, 7)],
                   feature_group_count=256, dtype=jnp.float32)
    p = jax.jit(lambda: conv.init(jax.random.PRNGKey(0), grid.astype(jnp.float32)))()
    f = jax.jit(lambda p, a: jnp.mean(
        nn.gelu(conv.apply(p, a.astype(jnp.float32)), approximate=False), axis=1, keepdims=True))
    print(f"posconv depthwise f32: {timeit(f, p, grid)*1e3:.2f} ms")

    # 1D time-only grouped conv (k=16 over W), f32 — candidate cheaper form
    conv = nn.Conv(256, (1, 16), padding=[(0, 0), (8, 7)],
                   feature_group_count=8, dtype=jnp.float32)
    p = jax.jit(lambda: conv.init(jax.random.PRNGKey(0), grid.astype(jnp.float32)))()
    f = jax.jit(lambda p, a: jnp.mean(
        nn.gelu(conv.apply(p, a.astype(jnp.float32)), approximate=False), axis=1, keepdims=True))
    print(f"posconv 1x16 f32: {timeit(f, p, grid)*1e3:.2f} ms")

    # flash attention block sizes at T=3840, hd=128, heads=2
    t = 3840
    q = jnp.asarray(rng.standard_normal((B, 2, t, 128)), jnp.bfloat16)
    for bq, bk in ((2048, 1024), (1280, 1280), (1920, 1280), (3840, 1280),
                   (1280, 640), (768, 768)):
        mult = max(bq, bk)
        tp = -(-t // mult) * mult
        if tp % bq or tp % bk:
            continue
        pad = tp - t
        qq = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        seg = (jnp.arange(tp) >= t).astype(jnp.int32)[None].repeat(B, 0)

        def f(a, bq=bq, bk=bk, seg=seg):
            return flash_attention(
                a, a, a, segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=128**-0.5,
                block_sizes=BlockSizes(block_q=bq, block_k_major=bk,
                                       block_k=bk, block_b=1),
            )

        try:
            tms = timeit(jax.jit(f), qq) * 1e3
            print(f"flash bq={bq} bk={bk} (pad {pad}): {tms:.2f} ms")
        except Exception as e:
            print(f"flash bq={bq} bk={bk}: FAILED {type(e).__name__}")




def exp_splash():
    """Splash attention (newer pallas MHA kernel) vs our flash config at the
    DiT shapes: B=16, heads=2, T=3840, hd=128, full mask + padding seg ids."""
    from jax.experimental.pallas.ops.tpu import splash_attention as sa
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes as FBlock,
        SegmentIds as FSeg,
        flash_attention,
    )

    rng = np.random.default_rng(0)
    t, heads, hd = 3840, 2, 128
    q = jnp.asarray(rng.standard_normal((B, heads, t, hd)), jnp.bfloat16)

    # current flash config (pad to 4096)
    tp = 4096
    pad = tp - t
    qq = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    seg = (jnp.arange(tp) >= t).astype(jnp.int32)[None].repeat(B, 0)

    def f_flash(a):
        return flash_attention(
            a, a, a, segment_ids=FSeg(q=seg, kv=seg), sm_scale=hd**-0.5,
            block_sizes=FBlock(block_q=2048, block_k_major=1024,
                               block_k=1024, block_b=1),
        )

    print(f"flash 2048/1024: {timeit(jax.jit(f_flash), qq)*1e3:.2f} ms")

    # splash MHA, full mask over padded length, segment ids for padding
    mask = sa.MultiHeadMask(
        [sa.FullMask((tp, tp)) for _ in range(heads)]
    )
    for bq, bkv in ((2048, 1024), (1024, 1024), (512, 1024)):
        try:
            kernel = sa.make_splash_mha(
                mask,
                head_shards=1,
                q_seq_shards=1,
                block_sizes=sa.BlockSizes(
                    block_q=bq, block_kv=bkv, block_kv_compute=bkv,
                    block_q_dkv=bq, block_kv_dkv=bkv,
                    block_kv_dkv_compute=bkv, block_q_dq=bq, block_kv_dq=bkv,
                ),
            )
            sseg = sa.SegmentIds(q=seg[0], kv=seg[0])

            def f_splash(a, kernel=kernel, sseg=sseg):
                fn = jax.vmap(
                    lambda qq, kk, vv: kernel(
                        qq * (hd**-0.5), kk, vv, segment_ids=sseg
                    )
                )
                return fn(a, a, a)

            print(f"splash {bq}/{bkv}: {timeit(jax.jit(f_splash), qq)*1e3:.2f} ms")
        except Exception as e:
            print(f"splash {bq}/{bkv}: FAILED {type(e).__name__}: {e}")




def exp_flashb():
    """flash_attention block_b sweep at the DiT shapes."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention,
    )

    rng = np.random.default_rng(0)
    t, heads, hd, tp = 3840, 2, 128, 4096
    q = jnp.asarray(rng.standard_normal((B, heads, tp, hd)), jnp.bfloat16)
    seg = (jnp.arange(tp) >= t).astype(jnp.int32)[None].repeat(B, 0)
    for bb in (1, 2, 4):
        def f(a, bb=bb):
            return flash_attention(
                a, a, a, segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=hd**-0.5,
                block_sizes=BlockSizes(block_q=2048, block_k_major=1024,
                                       block_k=1024, block_b=bb),
            )
        try:
            print(f"flash block_b={bb}: {timeit(jax.jit(f), q)*1e3:.2f} ms")
        except Exception as e:
            print(f"flash block_b={bb}: FAILED {type(e).__name__}")




def exp_bigvgan():
    """BigVGAN standalone: lax depthwise sinc convs vs a shift-and-add
    formulation (the filter is shared across channels, so the conv is k
    fused scale-adds), f32."""
    import dex_tts_tpu.models.vocoder.bigvgan as bv
    import dex_tts_tpu.ops.snake as sk

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, 80, TY)), jnp.float32)
    gen = bv.BigVGANGenerator(bv.BigVGANConfig(num_mels=80))
    params = jax.jit(
        lambda: gen.init(jax.random.PRNGKey(0), mel[:1, :, :16])
    )()

    run = jax.jit(lambda p, m: gen.apply(p, m))
    t0 = timeit(run, params, mel)
    base = np.asarray(run(params, mel))
    print(f"bigvgan f32 lax-depthwise: {t0*1e3:.1f} ms")

    orig = sk._depthwise_conv

    def shift_add(x, filt, stride):
        f = np.asarray(filt)
        k = len(f)
        tout = (x.shape[1] - k) // stride + 1
        out = x[:, 0 : stride * tout : stride, :] * jnp.asarray(f[0], x.dtype)
        for j in range(1, k):
            out = out + x[:, j : j + stride * tout : stride, :] * jnp.asarray(
                f[j], x.dtype
            )
        return out

    # the generator reaches the depthwise convs via ops.snake (the
    # snake op was extracted there), so patch that module's global
    sk._depthwise_conv = shift_add
    try:
        run2 = jax.jit(lambda p, m: gen.apply(p, m))
        t1 = timeit(run2, params, mel)
        got = np.asarray(run2(params, mel))
        err = np.abs(got - base).max()
        print(f"bigvgan f32 shift-add:     {t1*1e3:.1f} ms  max|Δ|={err:.2e}")
    finally:
        sk._depthwise_conv = orig


if __name__ == "__main__":
    main()
