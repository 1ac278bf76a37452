"""Vocoder GAN training loop: step mechanics, convergence signal,
checkpoint roundtrip, DP equivalence, and the wav-segment data layer.
Reference counterpart: none — DEX-TTS ships the discriminators/losses
untrained (bigvgan/models.py:221-400); upstream HiFi-GAN's train.py is
the behavioral model (AdamW(0.8,0.99), LSGAN+FM+45·L1-mel)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dex_tts_tpu.audio.stft import MelSpectrogram
from dex_tts_tpu.audio.wav import write_wav
from dex_tts_tpu.data.vocoder_dataset import (
    WavSegmentDataset,
    wav_paths_from_source,
)
from dex_tts_tpu.models.vocoder import HiFiGANConfig, HiFiGANGenerator
from dex_tts_tpu.models.vocoder.discriminators import DiscriminatorConfig
from dex_tts_tpu.train.vocoder import (
    create_vocoder_train_state,
    make_vocoder_optimizer,
    make_vocoder_train_step,
)

SEGMENT = 256
HOP = 16

TINY_GEN = HiFiGANConfig(
    num_mels=8,
    upsample_rates=(4, 4),
    upsample_kernel_sizes=(8, 8),
    upsample_initial_channel=16,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)
TINY_DISC = DiscriminatorConfig(
    mpd_periods=(2, 3),
    mrd_resolutions=((64, 16, 32),),
    channel_mult=0.05,
)


def tiny_mel(fmax=8000.0):
    return MelSpectrogram(
        n_fft=64, hop_length=HOP, win_length=64, n_mels=8, fmax=fmax
    )


def sine_batch(b=4, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(SEGMENT) / 22050.0
    f = rng.uniform(200, 800, size=(b, 1))
    wav = 0.5 * np.sin(2 * np.pi * f * t[None, :])
    return {"wav": wav.astype(np.float32)}


@pytest.fixture(scope="module")
def setup():
    gen = HiFiGANGenerator(TINY_GEN)
    mel = tiny_mel()
    tx = make_vocoder_optimizer(lr=2e-3, steps_per_epoch=50)
    state, gen_tx, disc_tx, (mpd, mrd) = create_vocoder_train_state(
        gen, jnp.asarray(sine_batch()["wav"]), mel, TINY_DISC,
        gen_tx=tx, disc_tx=make_vocoder_optimizer(lr=2e-3),
    )
    step = make_vocoder_train_step(gen, mpd, mrd, gen_tx, disc_tx, mel)
    return gen, state, jax.jit(step)


@pytest.mark.slow
def test_vocoder_step_updates_and_converges(setup):
    gen, state, step = setup
    first = None
    for i in range(8):
        state, metrics = step(state, sine_batch(seed=i))
        m = {k: float(v) for k, v in metrics.items()}
        assert all(np.isfinite(v) for v in m.values()), m
        if first is None:
            first = m
    assert int(state.step) == 8
    # the λ=45 mel term dominates the generator objective; 8 steps at
    # lr 2e-3 must move it down on this toy distribution
    assert m["loss_mel"] < first["loss_mel"]
    # both players actually updated
    assert m["loss_disc"] != first["loss_disc"]


def test_vocoder_generator_output_shape(setup):
    gen, state, _ = setup
    mel = tiny_mel()
    wav = jnp.asarray(sine_batch()["wav"])
    mel_in = mel(wav)[0][:, :, : SEGMENT // HOP]
    fake = gen.apply({"params": state.gen_params}, mel_in)
    assert fake.shape == (4, SEGMENT)
    assert float(jnp.max(jnp.abs(fake))) <= 1.0


def test_vocoder_checkpoint_roundtrip(setup, tmp_path):
    from dex_tts_tpu.train.checkpoint import CheckpointManager

    _, state, step = setup
    state, _ = step(state, sine_batch())
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(state, "last")
    restored = ckpt.restore(state, "last")
    assert int(restored.step) == int(state.step)
    a = jax.tree.leaves(state.gen_params)[0]
    b = jax.tree.leaves(restored.gen_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_vocoder_dp_step_matches_single_device(setup):
    """Same batch through the dp-sharded step == single-device step."""
    from dex_tts_tpu.parallel import make_mesh, make_parallel_train_step
    from dex_tts_tpu.parallel.mesh import replicate_state

    gen, state, step = setup
    batch = sine_batch(b=8, seed=42)
    _, single = step(state, batch)

    mesh = make_mesh(n_devices=4)
    pstep = make_parallel_train_step(step, mesh, donate=False)
    _, sharded = pstep(replicate_state(state, mesh), batch)
    for k in single:
        np.testing.assert_allclose(
            float(single[k]), float(sharded[k]), rtol=2e-4, atol=2e-5
        )


def test_wav_segment_dataset(tmp_path):
    rng = np.random.default_rng(0)
    for i, n in enumerate([4000, 100, 9000]):
        write_wav(str(tmp_path / f"a{i}.wav"), rng.standard_normal(n) * 0.1)
    sub = tmp_path / "sub"
    os.makedirs(sub)
    write_wav(str(sub / "b.wav"), rng.standard_normal(3000) * 0.1)

    paths = wav_paths_from_source(str(tmp_path))
    assert len(paths) == 4  # recursive

    ds = WavSegmentDataset(paths, segment=2048, sample_rate=22050)
    batches = list(ds.batches(batch_size=3, steps=2))
    assert len(batches) == 2
    assert batches[0]["wav"].shape == (3, 2048)
    assert batches[0]["wav"].dtype == np.float32
    # short file zero-pads
    short = ds.sample_segment(1)
    assert short.shape == (2048,) and np.all(short[200:] == 0)


def test_wav_paths_from_filelist(tmp_path):
    """TTS filelist mel paths rewrite to the preprocessor's wav layout."""
    mel_dir = tmp_path / "feats" / "mel" / "spk1"
    wav_dir = tmp_path / "feats" / "wav" / "spk1"
    os.makedirs(mel_dir)
    os.makedirs(wav_dir)
    write_wav(str(wav_dir / "utt1.wav"), np.zeros(100, np.float32))
    fl = tmp_path / "train.txt"
    fl.write_text(f"{mel_dir}/spk1-mel-utt1.npy|hello|spk1\n")
    paths = wav_paths_from_source(str(fl))
    assert paths == [str(wav_dir / "utt1.wav")]
    assert os.path.isfile(paths[0])


@pytest.mark.slow
def test_load_vocoder_orbax_generator(setup, tmp_path):
    """load_vocoder restores a flax-native generator checkpoint written by
    train_vocoder.py (orbax `gen_last` dir + config.json arch)."""
    import json

    from dex_tts_tpu.eval.evaluation import load_vocoder
    from dex_tts_tpu.train.checkpoint import CheckpointManager
    from dex_tts_tpu.utils import Config

    _, state, _ = setup
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(state.gen_params, "gen_last")
    with open(tmp_path / "config.json", "w") as f:
        json.dump(
            {
                "num_mels": TINY_GEN.num_mels,
                "upsample_rates": list(TINY_GEN.upsample_rates),
                "upsample_kernel_sizes": list(TINY_GEN.upsample_kernel_sizes),
                "upsample_initial_channel": TINY_GEN.upsample_initial_channel,
                "resblock_kernel_sizes": list(TINY_GEN.resblock_kernel_sizes),
                "resblock_dilation_sizes": [
                    list(d) for d in TINY_GEN.resblock_dilation_sizes
                ],
            },
            f,
        )
    cfg = Config(
        {
            "vocoder": "hifigan",
            "preprocess": {"n_mels": TINY_GEN.num_mels},
            "path": {"vocoder_path": str(tmp_path)},
        }
    )
    voc, params = load_vocoder(cfg)
    assert voc.cfg.upsample_rates == TINY_GEN.upsample_rates
    a = jax.tree.leaves(state.gen_params)[0]
    b = jax.tree.leaves(params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_segment_must_be_hop_multiple(setup):
    """A segment not divisible by the mel hop fails with a clear error,
    not a shape mismatch deep inside jit."""
    _, state, _ = setup
    gen = HiFiGANGenerator(TINY_GEN)
    mel = tiny_mel()
    tx = make_vocoder_optimizer()
    from dex_tts_tpu.models.vocoder.discriminators import (
        MultiPeriodDiscriminator,
        MultiResolutionDiscriminator,
    )

    step = make_vocoder_train_step(
        gen,
        MultiPeriodDiscriminator(TINY_DISC),
        MultiResolutionDiscriminator(TINY_DISC),
        tx, tx, mel,
    )
    bad = {"wav": np.zeros((2, SEGMENT - 3), np.float32)}
    with pytest.raises(ValueError, match="multiple of the mel hop"):
        step(state, bad)


def test_dataset_rejects_missing_paths(tmp_path):
    write_wav(str(tmp_path / "ok.wav"), np.zeros(100, np.float32))
    with pytest.raises(FileNotFoundError, match="1/2 wav paths"):
        WavSegmentDataset(
            [str(tmp_path / "ok.wav"), str(tmp_path / "missing.wav")],
            segment=64,
        )


def test_dataset_cache_bound(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(3):
        write_wav(str(tmp_path / f"w{i}.wav"),
                  rng.standard_normal(5000) * 0.1)
    paths = wav_paths_from_source(str(tmp_path))
    # bound below one decoded file: nothing may be cached
    ds = WavSegmentDataset(paths, segment=1024, cache_bytes=1000)
    for i in range(3):
        ds.sample_segment(i)
    assert ds._cached_bytes == 0 and not ds._cache
    # generous bound: everything cached
    ds2 = WavSegmentDataset(paths, segment=1024, cache_bytes=1 << 20)
    for i in range(3):
        ds2.sample_segment(i)
    assert len(ds2._cache) == 3


@pytest.mark.slow
def test_generator_warm_start_from_torch_release(tmp_path):
    """train_vocoder --init_gen: a released torch generator checkpoint
    (weight-normed) replaces the fresh generator params (optimizer reset),
    and the GAN step trains on top of it."""
    import importlib.util
    import os

    import torch

    from tests.test_vocoder import (
        build_torch_generator,
        torch_state_to_reference_names,
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "dex_tts_tpu_train_vocoder", os.path.join(root, "train_vocoder.py")
    )
    tv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tv)

    torch.manual_seed(0)
    tgen = build_torch_generator(TINY_GEN)
    ckpt_path = str(tmp_path / "generator_release.pth")
    state_np = torch_state_to_reference_names(tgen, TINY_GEN)
    torch.save(
        {"generator": {k: torch.from_numpy(v) for k, v in state_np.items()}},
        ckpt_path,
    )

    gen = HiFiGANGenerator(TINY_GEN)
    mel = tiny_mel()
    gen_tx = make_vocoder_optimizer(lr=2e-3, steps_per_epoch=50)
    disc_tx = make_vocoder_optimizer(lr=2e-3)
    state, gen_tx, disc_tx, (mpd, mrd) = create_vocoder_train_state(
        gen, jnp.asarray(sine_batch()["wav"]), mel, TINY_DISC,
        gen_tx=gen_tx, disc_tx=disc_tx,
    )
    fresh_leaf = np.asarray(jax.tree.leaves(state.gen_params)[0])

    state = tv.warm_start_generator(state, gen, gen_tx, "hifigan", ckpt_path)
    warm_leaf = np.asarray(jax.tree.leaves(state.gen_params)[0])
    assert not np.array_equal(fresh_leaf, warm_leaf)

    from dex_tts_tpu.convert import hifigan_torch_to_flax, load_torch_checkpoint

    want = hifigan_torch_to_flax(load_torch_checkpoint(ckpt_path), TINY_GEN)
    for a, b in zip(jax.tree.leaves(state.gen_params), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step = jax.jit(
        make_vocoder_train_step(gen, mpd, mrd, gen_tx, disc_tx, mel)
    )
    state2, metrics = step(state, sine_batch())
    assert np.isfinite(float(metrics["loss_gen"]))
    assert int(state2.step) == int(state.step) + 1
