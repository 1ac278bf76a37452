"""Numerical parity of the text encoder and style encoders against torch
twins with reference naming, through the checkpoint converter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dex_tts_tpu.convert import (  # noqa: E402
    _basic_conv,
    _gru,
    _projection,
    _res_conv_block,
    dex_tts_torch_to_flax,
)
from dex_tts_tpu.models.ref_encoder import (  # noqa: E402
    LF0Encoder,
    TIVEncoder,
    TVEncoder,
)
from dex_tts_tpu.models.text_encoder import TextEncoder  # noqa: E402
from tests import torch_twins as tw  # noqa: E402


def state_of(module, prefix=""):
    return {
        (f"{prefix}.{k}" if prefix else k): v.numpy()
        for k, v in module.state_dict().items()
    }


def test_text_encoder_matches_torch_twin():
    n_vocab, c, heads, layers, ffn, n_feats, dp = 30, 16, 2, 2, 24, 12, 10
    torch.manual_seed(0)
    twin = tw.TextEncoderTwin(
        n_vocab, c, heads, layers, ffn, n_feats, dp, use_adaln=True
    ).eval()
    with torch.no_grad():
        for p in twin.parameters():
            p.add_(0.05 * torch.randn_like(p))

    rng = np.random.default_rng(0)
    x_ids = rng.integers(1, n_vocab, (2, 9)).astype(np.int64)
    lengths = np.asarray([9, 6])
    mask = (np.arange(9)[None] < lengths[:, None]).astype(np.float32)
    sty = rng.standard_normal((2, c)).astype(np.float32)

    with torch.no_grad():
        want_mu, want_logw = twin(
            torch.from_numpy(x_ids),
            torch.from_numpy(mask).unsqueeze(1),
            torch.from_numpy(sty),
        )
    want_mu = want_mu.numpy().transpose(0, 2, 1)
    want_logw = want_logw.numpy().transpose(0, 2, 1)

    model = TextEncoder(
        n_vocab=n_vocab, n_feats=n_feats, n_channels=c, filter_channels=ffn,
        filter_channels_dp=dp, n_heads=heads, n_layers=layers,
        use_adaln=True,
    )

    class FakeModel:
        enc_layers = layers
        use_style = True
        n_spks = 0
        dec_dim_mults = (1, 2)
        tv_layers = 0
        tiv_layers = 0
        lf0_layers = 0
        dit = None

    # build only the encoder subtree via the full converter
    state = state_of(twin, prefix="encoder")
    from dex_tts_tpu.convert import (
        _channel_ln,
        _conv1d,
        _conv1x1_to_dense,
        _dense,
        _projection_dp,
    )

    enc = {"emb": {"embedding": state["encoder.emb.weight"]}}
    prenet = {"proj": _conv1x1_to_dense(state, "encoder.prenet.proj")}
    for i in range(3):
        prenet[f"conv_{i}"] = {
            "Conv_0": _conv1d(state, f"encoder.prenet.conv_layers.{i}")
        }
        prenet[f"norm_{i}"] = _channel_ln(state, f"encoder.prenet.norm_layers.{i}")
    enc["prenet"] = prenet
    retnet = {"norm": {"weight": state["encoder.encoder.layer_norm.weight"]}}
    for i in range(layers):
        base = f"encoder.encoder.layers.{i}"
        retnet[f"layer_{i}"] = {
            "retention_norm": {
                "weight": state[f"{base}.retention_layer_norm.weight"]
            },
            "final_norm": {"weight": state[f"{base}.final_layer_norm.weight"]},
            "retention": {
                f"{p}_proj": _dense(state, f"{base}.retention.{p}_proj")
                for p in ("q", "k", "v", "g", "out")
            },
            "ffn": {
                "gate": _dense(state, f"{base}.ffn.gate"),
                "fc1": _dense(state, f"{base}.ffn.fc1"),
                "fc2": _dense(state, f"{base}.ffn.fc2"),
            },
            "adaln_1": {
                "W_scale": _dense(state, f"{base}.adaln_1.W_scale"),
                "W_bias": _dense(state, f"{base}.adaln_1.W_bias"),
            },
            "adaln_2": {
                "W_scale": _dense(state, f"{base}.adaln_2.W_scale"),
                "W_bias": _dense(state, f"{base}.adaln_2.W_bias"),
            },
        }
    enc["encoder"] = retnet
    enc["proj_m"] = _conv1x1_to_dense(state, "encoder.proj_m")
    enc["proj_w"] = _projection_dp(state, "encoder.proj_w")

    got_mu, got_logw, _ = model.apply(
        {"params": enc},
        jnp.asarray(x_ids.astype(np.int32)),
        jnp.asarray(lengths.astype(np.int32)),
        sty=jnp.asarray(sty),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got_mu), want_mu, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got_logw), want_logw, atol=1e-4, rtol=1e-3
    )


def test_tv_encoder_matches_torch_twin():
    torch.manual_seed(1)
    twin = tw.TVEncoderTwin(
        c_in=12, c_h=10, c_out=14, c_out_g=14, num_layer=2, n_emb=8
    ).eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12, 11)).astype(np.float32)
    mask = np.ones((2, 1, 11), np.float32)
    mask[1, :, 8:] = 0.0
    with torch.no_grad():
        want_z, want_dec = twin(torch.from_numpy(x), torch.from_numpy(mask))

    state = state_of(twin, prefix="tv_encoder")
    params, stats = {}, {}
    params["in_conv"], _ = _basic_conv(state, "tv_encoder.in_conv", "ln")
    for i in range(2):
        params[f"block_{i}"], _ = _res_conv_block(
            state, f"tv_encoder.conv_blocks.{i}", "ln"
        )
    params["out_conv"], _ = _basic_conv(state, "tv_encoder.out_conv", None)
    params["proj_0"] = _projection(state, "tv_encoder.proj_0")
    params["proj_1"], s = _basic_conv(state, "tv_encoder.proj_1", "bn")
    stats["proj_1"] = s
    vq = {
        "vq": {
            "embedding": state["tv_encoder.vq.embedding"],
            "ema_count": state["tv_encoder.vq.ema_count"],
            "ema_weight": state["tv_encoder.vq.ema_weight"],
        }
    }

    model = TVEncoder(c_h=10, c_out=14, c_out_g=14, num_layer=2, n_emb=8)
    got_z, got_dec, _ = model.apply(
        {"params": params, "batch_stats": stats, "vq_stats": vq},
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(mask.transpose(0, 2, 1)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(got_z).transpose(0, 2, 1), want_z.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_dec).transpose(0, 2, 1), want_dec.numpy(), atol=1e-4
    )


def test_tiv_encoder_matches_torch_twin():
    torch.manual_seed(2)
    twin = tw.TIVEncoderTwin(c_in=12, c_h=10, c_out=6, num_layer=2).eval()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 12, 11)).astype(np.float32)
    mask = np.ones((2, 1, 11), np.float32)
    with torch.no_grad():
        want_out, want_skips = twin(torch.from_numpy(x), torch.from_numpy(mask))

    state = state_of(twin, prefix="tiv_encoder")
    params, stats = {}, {}
    params["in_conv"], s = _basic_conv(state, "tiv_encoder.in_conv", "bn")
    stats["in_conv"] = s
    for i in range(2):
        params[f"block_{i}"], s = _res_conv_block(
            state, f"tiv_encoder.conv_blocks.{i}", "bn"
        )
        stats[f"block_{i}"] = s
    params["out_conv"], s = _basic_conv(state, "tiv_encoder.out_conv", "bn")
    stats["out_conv"] = s

    model = TIVEncoder(c_h=10, c_out=6, num_layer=2)
    got_out, got_skips = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(mask.transpose(0, 2, 1)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(got_out).transpose(0, 2, 1), want_out.numpy(), atol=1e-4
    )
    for got_s, want_s in zip(got_skips, want_skips):
        np.testing.assert_allclose(
            np.asarray(got_s).transpose(0, 2, 1), want_s.numpy(), atol=1e-4
        )


def test_lf0_encoder_matches_torch_twin():
    torch.manual_seed(3)
    twin = tw.LF0EncoderTwin(c_h=8, c_out=10, c_out_g=10, num_layer=2).eval()
    rng = np.random.default_rng(3)
    lf0 = rng.standard_normal((2, 13)).astype(np.float32)
    mask = np.ones((2, 1, 13), np.float32)
    with torch.no_grad():
        want_enc, want_dec = twin(torch.from_numpy(lf0), torch.from_numpy(mask))

    state = state_of(twin, prefix="lf0_encoder")
    params = {}
    params["in_conv"], _ = _basic_conv(state, "lf0_encoder.in_conv", "ln")
    params["out_conv"], _ = _basic_conv(state, "lf0_encoder.out_conv", "ln")
    params["rnn"] = _gru(state, "lf0_encoder.rnn_layer", 2)
    params["proj"] = _projection(state, "lf0_encoder.proj")

    model = LF0Encoder(c_h=8, c_out=10, c_out_g=10, num_layer=2)
    got_enc, got_dec = model.apply(
        {"params": params},
        jnp.asarray(lf0),
        jnp.asarray(mask.transpose(0, 2, 1)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(got_enc).transpose(0, 2, 1), want_enc.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_dec).transpose(0, 2, 1), want_dec.numpy(), atol=2e-4
    )
