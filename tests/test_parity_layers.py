"""Layer-level numerical parity against torch oracles.

Where the reference module itself is importable (model/utils.py: torch-only)
it is used directly; elsewhere exact torch twins are built inline from
primitives (the reference's retention/dit modules depend on timm, which is
not in this image).
"""

import importlib.util
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_UTILS = "/root/reference/DEX-TTS/model/utils.py"


def _load_ref_utils():
    spec = importlib.util.spec_from_file_location("ref_utils", REF_UTILS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.isfile(REF_UTILS), reason="reference absent")
def test_generate_path_matches_reference():
    ref = _load_ref_utils()
    from dex_tts_tpu.ops import generate_path

    rng = np.random.default_rng(0)
    dur = rng.integers(0, 4, (3, 7)).astype(np.float32)
    mask = np.ones((3, 7, 30), np.float32)
    want = ref.generate_path(
        torch.from_numpy(dur), torch.from_numpy(mask)
    ).numpy()
    got = np.asarray(generate_path(jnp.asarray(dur), jnp.asarray(mask)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not os.path.isfile(REF_UTILS), reason="reference absent")
def test_sequence_mask_and_fix_len_match_reference():
    ref = _load_ref_utils()
    from dex_tts_tpu.ops import fix_len_compatibility, sequence_mask

    lengths = np.asarray([3, 7, 1])
    want = ref.sequence_mask(torch.from_numpy(lengths), 9).numpy()
    got = np.asarray(sequence_mask(jnp.asarray(lengths), 9))
    np.testing.assert_array_equal(got, want)
    for n in [1, 4, 170, 172, 517]:
        assert fix_len_compatibility(n) == ref.fix_len_compatibility(n)


def test_channel_layernorm_matches_torch_twin():
    from dex_tts_tpu.models.layers import ChannelLayerNorm

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 10, 6)).astype(np.float32)  # (B, T, C)
    gamma = rng.standard_normal(6).astype(np.float32)
    beta = rng.standard_normal(6).astype(np.float32)

    # torch twin of reference LayerNorm (text_encoder.py:11-29): stats over
    # channel dim with eps inside rsqrt
    xt = torch.from_numpy(x.transpose(0, 2, 1))  # (B, C, T)
    mean = xt.mean(1, keepdim=True)
    var = ((xt - mean) ** 2).mean(1, keepdim=True)
    want = (xt - mean) * torch.rsqrt(var + 1e-4)
    want = want * torch.from_numpy(gamma).view(1, -1, 1) + torch.from_numpy(
        beta
    ).view(1, -1, 1)
    want = want.numpy().transpose(0, 2, 1)

    m = ChannelLayerNorm(6)
    got = np.asarray(
        m.apply({"params": {"gamma": gamma, "beta": beta}}, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_adaptive_layernorm_matches_torch_twin():
    from dex_tts_tpu.models.layers import AdaptiveLayerNorm

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 8)).astype(np.float32)
    sty = rng.standard_normal((2, 8)).astype(np.float32)
    w_scale = rng.standard_normal((8, 8)).astype(np.float32) * 0.1
    b_scale = rng.standard_normal(8).astype(np.float32)
    w_bias = rng.standard_normal((8, 8)).astype(np.float32) * 0.1
    b_bias = rng.standard_normal(8).astype(np.float32)

    # torch twin (reference base.py:161-194)
    xt = torch.from_numpy(x)
    mean = xt.mean(-1, keepdim=True)
    std = (((xt - mean) ** 2).mean(-1, keepdim=True) + 1e-5).sqrt()
    y = (xt - mean) / std
    scale = torch.from_numpy(sty) @ torch.from_numpy(w_scale).T + torch.from_numpy(b_scale)
    bias = torch.from_numpy(sty) @ torch.from_numpy(w_bias).T + torch.from_numpy(b_bias)
    want = (y * scale.unsqueeze(1) + bias.unsqueeze(1)).numpy()

    m = AdaptiveLayerNorm(8)
    params = {
        "W_scale": {"kernel": w_scale.T, "bias": b_scale},
        "W_bias": {"kernel": w_bias.T, "bias": b_bias},
    }
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x), jnp.asarray(sty)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_retention_softmax_attention_matches_torch_twin():
    """The softmax-retention core: rotary theta-shift + masked softmax +
    per-head RMSNorm + swish gate (reference: retention.py:223-295 with
    use_softmax=True, use_decay=False)."""
    from dex_tts_tpu.models.retention import (
        MultiScaleRetention,
        RetNetEncoderConfig,
        rel_pos,
    )

    b, t, d, h = 2, 9, 16, 2
    rng = np.random.default_rng(3)
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    lengths = np.asarray([9, 6])
    retention_mask = (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)

    cfg = RetNetEncoderConfig(embed_dim=d, value_dim=d, num_heads=h)
    m = MultiScaleRetention(cfg)
    variables = m.init(
        jax.random.PRNGKey(0),
        jnp.asarray(x),
        *rel_pos(cfg, t, jnp.asarray(retention_mask)),
    )
    p = variables["params"]
    sin, cos, dmask = rel_pos(cfg, t, jnp.asarray(retention_mask))
    got = np.asarray(
        m.apply(variables, jnp.asarray(x), sin, cos, dmask, train=False)
    )

    # torch twin
    def rot(v):
        v1, v2 = v[..., ::2], v[..., 1::2]
        return torch.stack((-v2, v1), dim=-1).flatten(-2)

    key_dim = d // h
    angle = 1.0 / (10000 ** np.linspace(0, 1, key_dim // 2))
    angle = np.repeat(angle, 2)
    idx = np.arange(t)
    sin_t = torch.from_numpy(np.sin(idx[:, None] * angle[None, :]).astype(np.float32))
    cos_t = torch.from_numpy(np.cos(idx[:, None] * angle[None, :]).astype(np.float32))

    xt = torch.from_numpy(x)
    wq = torch.from_numpy(np.asarray(p["q_proj"]["kernel"])).T
    wk = torch.from_numpy(np.asarray(p["k_proj"]["kernel"])).T
    wv = torch.from_numpy(np.asarray(p["v_proj"]["kernel"])).T
    wg = torch.from_numpy(np.asarray(p["g_proj"]["kernel"])).T
    wo = torch.from_numpy(np.asarray(p["out_proj"]["kernel"])).T

    q = (xt @ wq.T).view(b, t, h, key_dim).transpose(1, 2)
    k = (xt @ wk.T).view(b, t, h, key_dim).transpose(1, 2) * key_dim**-0.5
    v = (xt @ wv.T).view(b, t, h, key_dim).transpose(1, 2)
    g = xt @ wg.T
    qr = q * cos_t + rot(q) * sin_t
    kr = k * cos_t + rot(k) * sin_t
    mask2 = torch.from_numpy(retention_mask)
    dmask_t = (mask2.unsqueeze(2) * mask2.unsqueeze(1)).unsqueeze(1)
    scores = qr @ kr.transpose(-1, -2) * dmask_t
    scores = scores.masked_fill(dmask_t == 0, -1e4)
    weights = torch.softmax(scores, dim=-1)
    out = (weights @ v).transpose(1, 2)  # (B, T, H, D)
    rmsn = out * torch.rsqrt(out.pow(2).mean(-1, keepdim=True) + 1e-6)
    merged = rmsn.reshape(b, t, d)
    gated = torch.nn.functional.silu(g) * merged
    want = (gated @ wo.T).detach().numpy()

    np.testing.assert_allclose(got, want, atol=2e-4)


def test_groupnorm_block_matches_torch_twin():
    """U-Net Block: conv3x3 → GroupNorm(8) → Mish
    (reference: diffusion.py:44-53)."""
    from dex_tts_tpu.models.unet import Block

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 8, 10, 16)).astype(np.float32)
    mask = np.ones((2, 1, 10, 1), np.float32)

    blk = Block(dim_out=16)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    got = np.asarray(blk.apply(variables, jnp.asarray(x), jnp.asarray(mask)))

    p = variables["params"]
    conv = torch.nn.Conv2d(16, 16, 3, padding=1)
    with torch.no_grad():
        conv.weight.copy_(
            torch.from_numpy(np.asarray(p["Conv_0"]["kernel"])).permute(3, 2, 0, 1)
        )
        conv.bias.copy_(torch.from_numpy(np.asarray(p["Conv_0"]["bias"])))
    gn = torch.nn.GroupNorm(8, 16, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(np.asarray(p["GroupNorm_0"]["scale"])))
        gn.bias.copy_(torch.from_numpy(np.asarray(p["GroupNorm_0"]["bias"])))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        h = gn(conv(xt))
        want = (h * torch.tanh(torch.nn.functional.softplus(h))).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-5)


def test_instance_norm_stats_match_torch():
    from dex_tts_tpu.models.layers import (
        instance_norm_stats_1d,
        instance_norm_stats_2d,
    )

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 12, 6)).astype(np.float32)  # (B, T, C)
    xt = torch.from_numpy(x.transpose(0, 2, 1))  # (B, C, T)
    want_mean = xt.mean(-1).numpy()
    want_std = (xt.var(-1) + 1e-5).sqrt().numpy()  # torch var: unbiased
    mean, std = instance_norm_stats_1d(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mean)[:, 0, :], want_mean, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std)[:, 0, :], want_std, atol=1e-6)

    x2 = rng.standard_normal((2, 4, 5, 3)).astype(np.float32)  # (B, H, W, C)
    xt2 = torch.from_numpy(x2.transpose(0, 3, 1, 2))
    want_mean2 = xt2.reshape(2, 3, -1).mean(2).numpy()
    want_std2 = (xt2.reshape(2, 3, -1).var(2) + 1e-5).sqrt().numpy()
    mean2, std2 = instance_norm_stats_2d(jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(mean2)[:, 0, 0, :], want_mean2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std2)[:, 0, 0, :], want_std2, atol=1e-6)


def test_sinusoidal_pos_emb_matches_reference_formula():
    from dex_tts_tpu.models.layers import SinusoidalPosEmb

    t = np.asarray([0.1, 0.5], np.float32)
    dim = 8
    # reference diffusion.py:108-120
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = np.exp(np.arange(half) * -emb)
    args = 1000 * t[:, None] * freqs[None, :]
    want = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
    got = np.asarray(SinusoidalPosEmb(dim)(jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize(
    "use_softmax,use_decay", [(True, True), (False, False), (False, True)]
)
def test_retention_variant_modes_match_torch_twin(use_softmax, use_decay):
    """The non-default retention modes: exponential per-head decay mask
    (use_decay — reference retention.py:141-147 parallel branch, including
    its sqrt row normalization and padding nan handling) and the
    sum-normalized non-softmax weighting (use_softmax=False — reference
    retention.py:238: scores / clamp(|detach(row sum)|, 1)). Every
    reference config runs softmax+no-decay; these paths are API-present
    there and working here."""
    from dex_tts_tpu.models.retention import (
        MultiScaleRetention,
        RetNetEncoderConfig,
        rel_pos,
    )

    b, t, d, h = 2, 9, 16, 2
    rng = np.random.default_rng(7)
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    lengths = np.asarray([9, 6])
    rm = (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)

    cfg = RetNetEncoderConfig(
        embed_dim=d, value_dim=d, num_heads=h,
        use_softmax=use_softmax, use_decay=use_decay,
    )
    m = MultiScaleRetention(cfg)
    sin, cos, dmask = rel_pos(cfg, t, jnp.asarray(rm))
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), sin, cos, dmask)
    got = np.asarray(
        m.apply(variables, jnp.asarray(x), sin, cos, dmask, train=False)
    )

    # ---- torch twin of the same formulas ----
    p = variables["params"]
    key_dim = d // h

    def rot(v):
        v1, v2 = v[..., ::2], v[..., 1::2]
        return torch.stack((-v2, v1), dim=-1).flatten(-2)

    angle = 1.0 / (10000 ** np.linspace(0, 1, key_dim // 2))
    angle = np.repeat(angle, 2)
    idx = np.arange(t)
    sin_t = torch.from_numpy(
        np.sin(idx[:, None] * angle[None, :]).astype(np.float32)
    )
    cos_t = torch.from_numpy(
        np.cos(idx[:, None] * angle[None, :]).astype(np.float32)
    )

    # decay mask, reference RetNetRelPos parallel branch (retention_mask
    # arrives as (B, 1, T) from retnet.py, so the unsqueeze pair builds the
    # full (B, 1, T, T) outer product)
    rm_t = torch.from_numpy(rm).unsqueeze(1)  # (B, 1, T)
    mask2d = rm_t.unsqueeze(2) * rm_t.unsqueeze(-1)  # (B, 1, T, T)
    if use_decay:
        decay = torch.log(1 - 2 ** (-5 - torch.arange(h, dtype=torch.float)))
        diff = torch.from_numpy(
            (idx[:, None] - idx[None, :]).astype(np.float32)
        )
        dm = torch.masked_fill(
            diff.expand(b, 1, t, t).clone(), ~mask2d.bool(), float("inf")
        )
        dm = torch.exp(dm * decay.view(1, -1, 1, 1))
        dm = torch.nan_to_num(dm)
        dm = dm / dm.sum(dim=-1, keepdim=True).sqrt()
        dm = torch.nan_to_num(dm, nan=0.0)
    else:
        dm = mask2d.expand(b, h, t, t)
    np.testing.assert_allclose(np.asarray(dmask), dm.numpy(), atol=1e-6)

    xt = torch.from_numpy(x)
    wq = torch.from_numpy(np.asarray(p["q_proj"]["kernel"])).T
    wk = torch.from_numpy(np.asarray(p["k_proj"]["kernel"])).T
    wv = torch.from_numpy(np.asarray(p["v_proj"]["kernel"])).T
    wg = torch.from_numpy(np.asarray(p["g_proj"]["kernel"])).T
    wo = torch.from_numpy(np.asarray(p["out_proj"]["kernel"])).T

    q = (xt @ wq.T).view(b, t, h, key_dim).transpose(1, 2)
    k = (xt @ wk.T).view(b, t, h, key_dim).transpose(1, 2) * key_dim**-0.5
    v = (xt @ wv.T).view(b, t, h, key_dim).transpose(1, 2)
    g = xt @ wg.T
    qr = q * cos_t + rot(q) * sin_t
    kr = k * cos_t + rot(k) * sin_t
    scores = (qr @ kr.transpose(-1, -2)) * dm
    if use_softmax:
        scores = scores.masked_fill(dm == 0, -1e4)
        weights = torch.softmax(scores, dim=-1)
    else:
        weights = scores / scores.detach().sum(
            dim=-1, keepdim=True
        ).abs().clamp(min=1)
    out = (weights @ v).transpose(1, 2)
    rmsn = out * torch.rsqrt(out.pow(2).mean(-1, keepdim=True) + 1e-6)
    merged = rmsn.reshape(b, t, d)
    gated = torch.nn.functional.silu(g) * merged
    want = (gated @ wo.T).detach().numpy()

    np.testing.assert_allclose(got, want, atol=2e-4)
