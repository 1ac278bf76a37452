import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dex_tts_tpu.models.dit import DiTConfig
from dex_tts_tpu.models.edm import SamplerConfig
from dex_tts_tpu.models.tts import DeXTTS, GeDEXTTS

TINY_DIT = DiTConfig(
    patch_size=3,
    stride_size=2,
    hidden_size=32,
    depth=1,
    num_heads=2,
    mlp_ratio=2.0,
    conv_pos=4,
    conv_pos_groups=2,
)


def tiny_gedex(n_spks=1):
    return GeDEXTTS(
        n_vocab=149,
        n_feats=16,
        n_spks=n_spks,
        spk_emb_dim=8,
        enc_channels=24,
        enc_filter_channels=32,
        enc_filter_channels_dp=16,
        enc_heads=2,
        enc_layers=2,
        dec_dim=8,
        dec_dim_mults=(1, 2),
        dit=TINY_DIT,
    )


def tiny_dex():
    return DeXTTS(
        n_vocab=149,
        n_feats=16,
        enc_channels=24,
        enc_filter_channels=32,
        enc_filter_channels_dp=16,
        enc_heads=2,
        enc_layers=2,
        dec_dim=8,
        dec_dim_mults=(1, 2),
        dit=TINY_DIT,
        tv_c_h=12,
        tv_c_out=24,
        tv_c_out_g=24,
        tv_layers=2,
        tv_n_emb=16,
        lf0_c_h=12,
        lf0_c_out=24,
        lf0_c_out_g=24,
        lf0_layers=1,
        tiv_c_h=16,
        tiv_c_out=8,
        tiv_layers=2,
    )


def gedex_batch():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 148, (2, 11)), jnp.int32)
    x_lengths = jnp.asarray([11, 7], jnp.int32)
    y = jnp.asarray(rng.standard_normal((2, 16, 36)), jnp.float32)
    y_lengths = jnp.asarray([36, 20], jnp.int32)
    return x, x_lengths, y, y_lengths


def dex_style_inputs(rng):
    ref = jnp.asarray(rng.standard_normal((2, 16, 24)), jnp.float32)
    lf0 = jnp.asarray(rng.standard_normal((2, 24)), jnp.float32)
    return {
        "ref": ref,
        "ref_lengths": jnp.asarray([24, 15], jnp.int32),
        "sty": ref,
        "sty_lengths": jnp.asarray([24, 15], jnp.int32),
        "lf0": lf0,
        "lf0_lengths": jnp.asarray([24, 15], jnp.int32),
    }


@pytest.fixture(scope="module")
def gedex_vars():
    model = tiny_gedex()
    x, x_lengths, y, y_lengths = gedex_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jax.random.PRNGKey(2),
        x,
        x_lengths,
        y,
        y_lengths,
        out_size=20,
        train=False,
        method=GeDEXTTS.compute_loss,
    )
    return model, variables


def test_gedex_compute_loss(gedex_vars):
    model, variables = gedex_vars
    x, x_lengths, y, y_lengths = gedex_batch()
    losses = model.apply(
        variables,
        jax.random.PRNGKey(3),
        x,
        x_lengths,
        y,
        y_lengths,
        out_size=20,
        train=True,
        method=GeDEXTTS.compute_loss,
        rngs={"dropout": jax.random.PRNGKey(4)},
    )
    assert set(losses) == {"dur_loss", "prior_loss", "diff_loss"}
    for name, value in losses.items():
        assert np.isfinite(float(value)), name


def test_gedex_synthesize(gedex_vars):
    model, variables = gedex_vars
    x, x_lengths, *_ = gedex_batch()
    enc, dec, attn, y_lengths = model.apply(
        variables,
        jax.random.PRNGKey(5),
        x,
        x_lengths,
        y_max_length=64,
        sampler=SamplerConfig(num_steps=3),
        temperature=1.5,
        method=GeDEXTTS.synthesize,
    )
    assert enc.shape == (2, 16, 64)
    assert dec.shape == (2, 16, 64)
    assert attn.shape == (2, 11, 64)
    assert np.isfinite(np.asarray(dec)).all()
    lens = np.asarray(y_lengths)
    assert (lens >= 1).all() and (lens <= 64).all()
    # masked frames are zero
    d = np.asarray(dec)
    assert np.abs(d[1, :, lens[1]:]).max() == 0


def test_gedex_multispeaker():
    model = tiny_gedex(n_spks=4)
    x, x_lengths, y, y_lengths = gedex_batch()
    spk = jnp.asarray([0, 3], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jax.random.PRNGKey(2),
        x,
        x_lengths,
        y,
        y_lengths,
        out_size=20,
        spk=spk,
        train=False,
        method=GeDEXTTS.compute_loss,
    )
    losses = model.apply(
        variables,
        jax.random.PRNGKey(3),
        x,
        x_lengths,
        y,
        y_lengths,
        out_size=20,
        spk=spk,
        train=False,
        method=GeDEXTTS.compute_loss,
    )
    assert np.isfinite(float(sum(losses.values())))


def test_dex_loss_and_synthesize():
    model = tiny_dex()
    rng = np.random.default_rng(1)
    x, x_lengths, y, y_lengths = gedex_batch()
    style = dex_style_inputs(rng)
    init_rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(
        init_rngs,
        jax.random.PRNGKey(2),
        x,
        x_lengths,
        y,
        y_lengths,
        out_size=20,
        train=False,
        **style,
        method=DeXTTS.compute_loss,
    )
    assert "vq_stats" in variables and "batch_stats" in variables

    losses, updates = model.apply(
        variables,
        jax.random.PRNGKey(3),
        x,
        x_lengths,
        y,
        y_lengths,
        out_size=20,
        train=True,
        **style,
        method=DeXTTS.compute_loss,
        rngs={"dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats", "vq_stats"],
    )
    assert set(losses) == {"dur_loss", "prior_loss", "diff_loss", "vq_loss"}
    for name, value in losses.items():
        assert np.isfinite(float(value)), name
    # VQ EMA state actually moved
    before = variables["vq_stats"]["tv_encoder"]["vq"]["ema_count"]
    after = updates["vq_stats"]["tv_encoder"]["vq"]["ema_count"]
    assert float(jnp.abs(after - before).max()) > 0

    enc, dec, attn, _ = model.apply(
        variables,
        jax.random.PRNGKey(5),
        x,
        x_lengths,
        y_max_length=64,
        sampler=SamplerConfig(num_steps=2),
        temperature=1.5,
        **style,
        method=DeXTTS.synthesize,
    )
    assert dec.shape == (2, 16, 64)
    assert np.isfinite(np.asarray(dec)).all()


def test_attention_auto_mode_resolution():
    """attention="auto" resolves per static token count: einsum below the
    threshold (training's short crops), flash_bf16 at/above (long
    inference buckets). Pinned modes pass through untouched."""
    from dex_tts_tpu.models.dit import resolve_attention_mode

    auto = DiTConfig(attention="auto")
    # eval crossover (768): flash measured faster from 860 tokens up
    assert resolve_attention_mode(auto, 512) == "einsum"
    assert resolve_attention_mode(auto, 860) == "flash_bf16"
    assert resolve_attention_mode(auto, 3840) == "flash_bf16"
    # train crossover sits higher (2048): einsum wins at training's ~860
    # tokens (short segment crops) because the flash backward blocks lose
    assert resolve_attention_mode(auto, 860, train=True) == "einsum"
    assert resolve_attention_mode(auto, 2048, train=True) == "flash_bf16"
    pinned = DiTConfig(attention="splash_bf16")
    assert resolve_attention_mode(pinned, 16) == "splash_bf16"
    assert resolve_attention_mode(pinned, 8192, train=True) == "splash_bf16"


def test_attention_auto_matches_einsum_below_threshold():
    """Below the token threshold auto takes the einsum path bit-exactly
    (and off-TPU the fallback is einsum regardless of resolved mode)."""
    from dex_tts_tpu.models.dit import MHSA

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 24, 32)), jnp.float32
    )
    out = {}
    for mode in ("einsum", "auto"):
        m = MHSA(DiTConfig(hidden_size=32, num_heads=2, attention=mode))
        v = m.init(jax.random.PRNGKey(0), x)
        out[mode] = np.asarray(m.apply(v, x))
    np.testing.assert_array_equal(out["einsum"], out["auto"])


def test_denoiser_mid_cache_wiring(gedex_vars):
    """return_mid / mid_override: feeding the captured DiT mid-block back
    reproduces the full output exactly (only the adaptors/DiT are skipped,
    the conv path is identical)."""
    model, variables = gedex_vars
    rng = np.random.default_rng(0)
    b, f, w = 2, 16, 32
    z = jnp.asarray(rng.standard_normal((b, f, w)), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((b, f, w)), jnp.float32)
    mask = jnp.ones((b, 1, w), jnp.float32)
    t = jnp.asarray([0.3, -0.2], jnp.float32)

    dec_vars = {"params": variables["params"]["decoder"]}

    def call(**kw):
        return model.decoder.apply(dec_vars, z, mask, mu, t, train=False, **kw)

    model_bound = model.bind(variables)
    out_full, mid = model_bound.decoder(
        z, mask, mu, t, train=False, return_mid=True
    )
    out_cached = model_bound.decoder(
        z, mask, mu, t, train=False, mid_override=mid
    )
    np.testing.assert_array_equal(np.asarray(out_cached), np.asarray(out_full))
    out_plain = model_bound.decoder(z, mask, mu, t, train=False)
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_full))


def test_dit_cache_turbo_sampler(gedex_vars):
    """dit_cache_interval=2: half the steps reuse the DiT mid-block. The
    approximate mel must be finite, masked, and in the ballpark of the
    exact sampler (same noise path — identical schedules, no sampling
    randomness beyond the shared key)."""
    model, variables = gedex_vars
    x, x_lengths, *_ = gedex_batch()
    # perturb the params: at init the DiT is adaLN-Zero (output exactly 0),
    # which would make cached and fresh mid-blocks trivially identical
    leaves, treedef = jax.tree.flatten(variables["params"])
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    variables = {
        **variables,
        "params": jax.tree.unflatten(
            treedef,
            [
                p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
                for p, k in zip(leaves, keys)
            ],
        ),
    }

    def run(sampler):
        return model.apply(
            variables,
            jax.random.PRNGKey(5),
            x,
            x_lengths,
            y_max_length=64,
            sampler=sampler,
            temperature=1.5,
            method=GeDEXTTS.synthesize,
        )

    _, dec_exact, _, lens = run(SamplerConfig(num_steps=4))
    _, dec_turbo, _, _ = run(
        SamplerConfig(num_steps=4, dit_cache_interval=2)
    )
    d = np.asarray(dec_turbo)
    assert np.isfinite(d).all()
    lens = np.asarray(lens)
    assert np.all(d[1, :, lens[1]:] == 0)  # empty slice ok if lens saturates
    exact = np.asarray(dec_exact)
    assert not np.array_equal(d, exact)  # it is an approximation...
    # ...but a close one even on random weights: same scale and small
    # relative deviation vs the exact trajectory
    rel = np.linalg.norm(d - exact) / np.linalg.norm(exact)
    assert rel < 0.5, rel

    with pytest.raises(ValueError):
        run(SamplerConfig(num_steps=4, dit_cache_interval=2, solver="heun"))
    with pytest.raises(ValueError):
        run(SamplerConfig(num_steps=5, dit_cache_interval=2))


def test_dit_cache_turbo_sampler_dex():
    """DEX variant of turbo sampling: the cached steps skip the style
    adaptors together with the DiT (use_style branch of the mid override)
    and still produce finite, masked, near-exact mels."""
    model = tiny_dex()
    rng = np.random.default_rng(1)
    x, x_lengths, y, y_lengths = gedex_batch()
    style = dex_style_inputs(rng)
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}
    variables = model.init(
        init_rngs, jax.random.PRNGKey(2), x, x_lengths, y, y_lengths,
        out_size=20, train=False, **style, method=DeXTTS.compute_loss,
    )
    leaves, treedef = jax.tree.flatten(variables["params"])
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    variables = {
        **variables,
        "params": jax.tree.unflatten(
            treedef,
            [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
             for p, k in zip(leaves, keys)],
        ),
    }

    def run(sampler):
        return model.apply(
            variables, jax.random.PRNGKey(5), x, x_lengths,
            y_max_length=64, sampler=sampler, temperature=1.5, **style,
            method=DeXTTS.synthesize,
        )

    _, dec_exact, _, lens = run(SamplerConfig(num_steps=4))
    _, dec_turbo, _, _ = run(SamplerConfig(num_steps=4, dit_cache_interval=2))
    d = np.asarray(dec_turbo)
    assert np.isfinite(d).all()
    lens = np.asarray(lens)
    assert np.all(d[1, :, lens[1]:] == 0)  # empty slice ok if lens saturates
    exact = np.asarray(dec_exact)
    assert not np.array_equal(d, exact)
    rel = np.linalg.norm(d - exact) / np.linalg.norm(exact)
    assert rel < 0.5, rel


def test_pos_conv_impl_lowerings_agree():
    """pos_conv_impl only changes the XLA lowering: one param tree (the
    GroupedPosConv2D tree matches nn.Conv's), identical math. grouped vs
    barrier must be bit-exact (optimization_barrier is the identity);
    vmap regroups the conv so allow float reassociation tolerance."""
    from dex_tts_tpu.models.dit import ConvTimePosEmbed

    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 4, 24, 32)), jnp.float32
    )
    cfgs = {
        impl: DiTConfig(
            hidden_size=32, conv_pos=16, conv_pos_groups=8, pos_conv_impl=impl
        )
        for impl in ("grouped", "barrier", "vmap", "nchw")
    }
    v = ConvTimePosEmbed(cfgs["grouped"]).init(jax.random.PRNGKey(0), x)
    out = {
        impl: np.asarray(ConvTimePosEmbed(cfg).apply(v, x))
        for impl, cfg in cfgs.items()
    }
    np.testing.assert_array_equal(out["grouped"], out["barrier"])
    np.testing.assert_allclose(out["vmap"], out["grouped"], atol=2e-6)
    np.testing.assert_allclose(out["nchw"], out["grouped"], atol=2e-6)

    with pytest.raises(ValueError, match="GroupedPosConv2D.impl"):
        ConvTimePosEmbed(
            DiTConfig(hidden_size=32, pos_conv_impl="typo")
        ).init(jax.random.PRNGKey(0), x)


def test_linattn_fused_impl_matches_tokenmajor():
    """LinearAttention impl="fused" is an exact-math relowering: the
    cross-head context products are multiplied by a 0/1 block mask and
    fp summation with zeros is exact, so outputs must agree to float
    reassociation tolerance (bit-exactness isn't guaranteed: XLA may
    tile the two contraction shapes differently)."""
    from dex_tts_tpu.models.unet import LinearAttention

    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 8, 24, 16)), jnp.float32
    )
    base = LinearAttention(heads=4, dim_head=8, impl="tokenmajor")
    v = base.init(jax.random.PRNGKey(0), x)
    out_tm = np.asarray(base.apply(v, x))
    out_fu = np.asarray(
        LinearAttention(heads=4, dim_head=8, impl="fused").apply(v, x)
    )
    assert not np.allclose(out_tm, 0)
    np.testing.assert_allclose(out_fu, out_tm, atol=1e-5, rtol=1e-5)


def test_pos_embed_time_conv1d_variant():
    """pos_embed_time="conv1d" (TPU-fast opt-in, NOT checkpoint-compatible
    with the reference's 2-D conv): broadcastable (B, 1, W, D) output like
    the 2-D path, distinct param name so converted reference checkpoints
    fail loudly, and typos rejected."""
    from dex_tts_tpu.models.dit import ConvTimePosEmbed

    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 4, 24, 32)), jnp.float32
    )
    cfg1d = DiTConfig(
        hidden_size=32, conv_pos=16, conv_pos_groups=8,
        pos_embed_time="conv1d",
    )
    v1 = ConvTimePosEmbed(cfg1d).init(jax.random.PRNGKey(0), x)
    out = np.asarray(ConvTimePosEmbed(cfg1d).apply(v1, x))
    assert out.shape == (2, 1, 24, 32)
    assert np.isfinite(out).all() and not np.allclose(out, 0)
    # distinct param: a 2-D checkpoint cannot silently load into conv1d
    assert "pos_conv1d" in v1["params"]
    cfg2d = DiTConfig(hidden_size=32, conv_pos=16, conv_pos_groups=8)
    v2 = ConvTimePosEmbed(cfg2d).init(jax.random.PRNGKey(0), x)
    assert "pos_conv" in v2["params"] and "pos_conv1d" not in v2["params"]
    # 1-D kernel is (k, C/G, C); 2-D is (k, k, C/G, C)
    assert v1["params"]["pos_conv1d"]["kernel"].ndim == 3

    with pytest.raises(ValueError, match="pos_embed_time"):
        ConvTimePosEmbed(
            DiTConfig(hidden_size=32, pos_embed_time="typo")
        ).init(jax.random.PRNGKey(0), x)
