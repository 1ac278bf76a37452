"""Expressive (DEX) pipeline end-to-end: reference wav → mel+lf0 features →
style-conditioned synthesis → vocoded audio."""

import os

import jax
import numpy as np
import pytest

from dex_tts_tpu.audio.wav import write_wav
from dex_tts_tpu.models.dit import DiTConfig
from dex_tts_tpu.models.edm import SamplerConfig
from dex_tts_tpu.models.tts import DeXTTS
from dex_tts_tpu.models.vocoder import HiFiGANConfig, HiFiGANGenerator
from dex_tts_tpu.pipeline import Synthesizer

TINY_DIT = DiTConfig(
    patch_size=3, stride_size=2, hidden_size=32, depth=1, num_heads=2,
    mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2,
)
TINY_VOC = HiFiGANConfig(
    num_mels=80,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=16,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),),
)


@pytest.fixture(scope="module")
def dex_synth():
    model = DeXTTS(
        n_vocab=149, n_feats=80, enc_channels=24, enc_filter_channels=32,
        enc_filter_channels_dp=16, enc_heads=2, enc_layers=1, dec_dim=8,
        dec_dim_mults=(1, 2), dit=TINY_DIT,
        tv_c_h=12, tv_c_out=24, tv_c_out_g=24, tv_layers=1, tv_n_emb=8,
        lf0_c_h=12, lf0_c_out=24, lf0_c_out_g=24, lf0_layers=1,
        tiv_c_h=16, tiv_c_out=8, tiv_layers=1,
    )
    import jax.numpy as jnp

    b, tr = 1, 32
    style = {
        "ref": jnp.zeros((b, 80, tr)),
        "ref_lengths": jnp.full((b,), tr, jnp.int32),
        "sty": jnp.zeros((b, 80, tr)),
        "sty_lengths": jnp.full((b,), tr, jnp.int32),
        "lf0": jnp.zeros((b, tr)),
        "lf0_lengths": jnp.full((b,), tr, jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jax.random.PRNGKey(2),
        jnp.ones((b, 8), jnp.int32),
        jnp.full((b,), 8, jnp.int32),
        y_max_length=32,
        sampler=SamplerConfig(num_steps=2),
        **style,
        method=DeXTTS.synthesize,
    )
    voc = HiFiGANGenerator(TINY_VOC)
    voc_params = voc.init(jax.random.PRNGKey(3), jnp.zeros((1, 80, 8)))["params"]
    return Synthesizer(
        model, variables, vocoder=voc, vocoder_params=voc_params,
        sampler=SamplerConfig(num_steps=2), x_quantum=8, y_quantum=16,
    )


def test_dex_tts_from_reference_wav(dex_synth, tmp_path):
    # a voiced reference utterance (vibrato tone + noise)
    sr = 22050
    t = np.arange(int(sr * 0.7)) / sr
    f0 = 200 + 20 * np.sin(2 * np.pi * 3 * t)
    wav = (0.5 * np.sin(2 * np.pi * np.cumsum(f0) / sr)).astype(np.float32)
    wav += 0.01 * np.random.default_rng(0).standard_normal(len(wav)).astype(
        np.float32
    )
    ref_path = os.path.join(tmp_path, "ref.wav")
    write_wav(ref_path, wav, sr)

    out = dex_synth.tts(
        ["hello world"], key=jax.random.PRNGKey(0), ref_wavs=[ref_path]
    )[0]
    assert out["mel"].shape[0] == 80
    assert np.isfinite(out["mel"]).all()
    assert out["wav"].shape == (out["n_frames"] * 8,)
    assert np.isfinite(out["wav"]).all()


def test_dex_tts_from_ref_feats(dex_synth):
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((80, 40)).astype(np.float32)
    lf0 = rng.standard_normal(40).astype(np.float32)
    out = dex_synth.tts(
        ["a test"], key=jax.random.PRNGKey(1), ref_feats=[(mel, lf0)]
    )[0]
    assert np.isfinite(out["wav"]).all()
