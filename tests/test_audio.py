import jax.numpy as jnp
import numpy as np
import pytest

from dex_tts_tpu.audio import MelSpectrogram, griffin_lim, istft, stft_magnitude
from dex_tts_tpu.audio.mel import hz_to_mel, mel_filterbank, mel_to_hz
from dex_tts_tpu.audio.stft import hann_window

torch = pytest.importorskip("torch")


def test_hann_window_matches_torch():
    ours = hann_window(1024)
    theirs = torch.hann_window(1024, periodic=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_stft_magnitude_matches_torch_stft():
    rng = np.random.default_rng(0)
    y = rng.uniform(-0.5, 0.5, (2, 4096)).astype(np.float32)
    ours = np.asarray(stft_magnitude(jnp.asarray(y), 1024, 256, 1024))
    ref = torch.stft(
        torch.from_numpy(y),
        n_fft=1024,
        hop_length=256,
        win_length=1024,
        window=torch.hann_window(1024, periodic=True),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).abs().numpy()
    assert ours.shape == ref.shape == (2, 513, 17)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_mel_scale_roundtrip():
    freqs = np.array([0.0, 250.0, 999.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(freqs)), freqs, rtol=1e-9)
    # linear below 1 kHz: 200/3 Hz per mel
    assert np.isclose(hz_to_mel(200.0 / 3.0), 1.0)
    assert np.isclose(hz_to_mel(1000.0), 15.0)


def test_mel_filterbank_structure():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has some mass, peaks strictly increase in frequency
    assert (fb.sum(axis=1) > 0).all()
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) > 0).all()
    # no response above fmax bin
    fft_freqs = np.linspace(0, 22050 / 2, 513)
    assert fb[:, fft_freqs > 8000.0].sum() == 0
    # slaney norm: filter areas ≈ 2/bandwidth ⇒ peak amplitudes fall off
    assert fb[0].max() > fb[-1].max()


def test_mel_spectrogram_shapes_and_compression():
    extractor = MelSpectrogram()
    y = jnp.asarray(
        np.sin(2 * np.pi * 440 * np.arange(22050) / 22050, dtype=np.float32)[None]
        * 0.5
    )
    mel, energy = extractor(y)
    assert mel.shape == (1, 80, 22050 // 256 + 1)
    assert energy.shape == (1, 22050 // 256 + 1)
    m = np.asarray(mel)
    assert np.isfinite(m).all()
    # log-compression floor
    assert m.min() >= np.log(1e-5) - 1e-4
    # 440 Hz tone: energy concentrated in low mel bands
    assert m[0, :20].max() > m[0, 60:].max()


def test_istft_roundtrip():
    rng = np.random.default_rng(1)
    y = rng.uniform(-0.5, 0.5, (1, 4096)).astype(np.float32)
    from dex_tts_tpu.audio.stft import _stft_complex

    spec = _stft_complex(jnp.asarray(y), 1024, 256, 1024)
    rec = np.asarray(istft(spec, 1024, 256, 1024, length=4096))
    np.testing.assert_allclose(rec[0], y[0], atol=1e-4)


def test_griffin_lim_runs_and_reduces_error():
    rng = np.random.default_rng(2)
    t = np.arange(8192) / 22050
    y = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    mag = stft_magnitude(jnp.asarray(y), 1024, 256, 1024)
    rec = griffin_lim(mag, n_iters=8)
    mag_rec = stft_magnitude(rec, 1024, 256, 1024)
    n = min(mag.shape[-1], mag_rec.shape[-1])
    err = float(jnp.mean(jnp.abs(mag[..., :n] - mag_rec[..., :n])))
    base = float(jnp.mean(jnp.abs(mag)))
    assert err < 0.5 * base
