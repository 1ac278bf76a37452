import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dex_tts_tpu.convert import bigvgan_torch_to_flax
from dex_tts_tpu.models.vocoder.bigvgan import (
    BigVGANConfig,
    BigVGANGenerator,
    downsample2x_antialias,
    kaiser_sinc_filter,
    upsample2x_antialias,
)

torch = pytest.importorskip("torch")
REF = "/root/reference/DEX-TTS"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)
if os.path.isdir(REF):
    sys.path.insert(0, REF)

TINY = BigVGANConfig(
    num_mels=8,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=32,
    resblock="1",
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    activation="snakebeta",
    snake_logscale=True,
)


def test_kaiser_filter_matches_torch():
    from bigvgan.alias_free_torch.filter import kaiser_sinc_filter1d

    want = kaiser_sinc_filter1d(0.25, 0.3, 12).numpy().ravel()
    got = kaiser_sinc_filter(0.25, 0.3, 12)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resample_matches_torch():
    from bigvgan.alias_free_torch.resample import DownSample1d, UpSample1d

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 50)).astype(np.float32)  # B, C, T
    with torch.no_grad():
        want_up = UpSample1d(2)(torch.from_numpy(x)).numpy()
        want_dn = DownSample1d(2)(torch.from_numpy(x)).numpy()
    got_up = np.asarray(upsample2x_antialias(jnp.asarray(x.transpose(0, 2, 1))))
    got_dn = np.asarray(downsample2x_antialias(jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(got_up.transpose(0, 2, 1), want_up, atol=1e-5)
    np.testing.assert_allclose(got_dn.transpose(0, 2, 1), want_dn, atol=1e-5)


def test_bigvgan_matches_reference_implementation():
    from bigvgan.models import BigVGAN as RefBigVGAN

    class H(dict):
        __getattr__ = dict.__getitem__

    h = H(
        num_mels=8,
        upsample_rates=[4, 2],
        upsample_kernel_sizes=[8, 4],
        upsample_initial_channel=32,
        resblock="1",
        resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
        activation="snakebeta",
        snake_logscale=True,
    )
    torch.manual_seed(0)
    ref = RefBigVGAN(h)
    ref.remove_weight_norm()
    ref.eval()
    # randomize snake params away from init for a stronger check
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if name.endswith(("alpha", "beta")):
                p.copy_(0.1 * torch.randn_like(p))

    mel = torch.randn(1, 8, 13)
    with torch.no_grad():
        want = ref(mel).numpy()[:, 0, :]

    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = bigvgan_torch_to_flax(state, TINY)
    model = BigVGANGenerator(TINY)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(mel.numpy())))
    assert got.shape == want.shape == (1, 13 * 8)
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_bigvgan_random_init_runs():
    model = BigVGANGenerator(TINY)
    mel = jnp.zeros((1, 8, 10))
    params = model.init(jax.random.PRNGKey(0), mel)
    wav = model.apply(params, mel)
    assert wav.shape == (1, 80)
    assert float(jnp.abs(wav).max()) <= 1.0


def test_bigvgan_stage_dtypes_and_taps():
    """Per-stage mixed precision + reduced snake taps: same param tree as
    the f32/k=12 config (dtype/taps are compute-only knobs), output close
    to the f32 reference on the same weights."""
    import dataclasses

    model32 = BigVGANGenerator(TINY)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 16)), jnp.float32
    )
    variables = model32.init(jax.random.PRNGKey(0), mel)
    ref = model32.apply(variables, mel)

    mixed = dataclasses.replace(TINY, stage_dtypes=("bfloat16", "float32"))
    got = BigVGANGenerator(mixed).apply(variables, mel)
    assert got.shape == ref.shape
    assert np.isfinite(np.asarray(got)).all()
    # bf16 early stage: close but not identical (random-init weights are
    # a rough proxy; the real SNR receipt is scripts/perf_bigvgan.py)
    rel = np.linalg.norm(np.asarray(got) - np.asarray(ref)) / np.linalg.norm(
        np.asarray(ref)
    )
    assert 0 < rel < 0.5, rel

    short = dataclasses.replace(TINY, snake_taps=8)
    model8 = BigVGANGenerator(short)
    # identical param tree: the k=8 model accepts the k=12 weights
    got8 = model8.apply(variables, mel)
    assert np.isfinite(np.asarray(got8)).all()
    err8 = np.abs(np.asarray(got8) - np.asarray(ref)).max()
    assert err8 > 0  # different filters, different (close) output


def test_bigvgan_stage_dtypes_length_mismatch_raises():
    import dataclasses

    bad = dataclasses.replace(TINY, stage_dtypes=("bfloat16",))
    mel = jnp.zeros((1, 8, 10))
    with pytest.raises(AssertionError):
        BigVGANGenerator(bad).init(jax.random.PRNGKey(0), mel)
