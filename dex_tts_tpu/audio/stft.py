"""Jittable STFT / mel-spectrogram / Griffin-Lim.

Capability equivalent of the reference's conv-basis STFT
(reference: DEX-TTS/audio/stft.py:16-178, audio/audio_processing.py:66-91),
re-designed for XLA: framed ``jnp.fft.rfft`` instead of an FFT-basis conv1d
(the conv formulation wastes MXU time on a dense 1024x1024 matmul per frame;
rfft lowers to a native FFT). Unlike the reference (which hardcodes
``.cuda()`` at audio/stft.py:68-72) this runs on any backend.

Numerics match: reflect padding of n_fft//2 on both sides, periodic Hann
window of win_length zero-centered inside n_fft, magnitude spectrum, Slaney
mel filterbank, log-compression ``log(clamp(x, 1e-5))``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.audio.mel import mel_filterbank


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic ("fftbins") Hann window, as scipy.signal.get_window('hann',
    n, fftbins=True)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def _padded_window(n_fft: int, win_length: int) -> np.ndarray:
    win = hann_window(win_length)
    if win_length < n_fft:
        pad = n_fft - win_length
        left = pad // 2
        win = np.pad(win, (left, pad - left))
    return win


def frame_signal(y: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """(B, T) → (B, n_frames, n_fft) frames after centered reflect pad."""
    pad = n_fft // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (y.shape[1] - n_fft) // hop_length
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    )
    return y[:, idx]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length"))
def stft_magnitude(
    y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int
) -> jnp.ndarray:
    """Magnitude STFT of (B, T) audio → (B, 1 + n_fft//2, n_frames)."""
    window = jnp.asarray(_padded_window(n_fft, win_length))
    frames = frame_signal(y, n_fft, hop_length) * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.abs(spec).swapaxes(1, 2)


def dynamic_range_compression(x: jnp.ndarray, C: float = 1.0, clip_val: float = 1e-5):
    """reference: DEX-TTS/audio/audio_processing.py:85-87."""
    return jnp.log(jnp.clip(x, clip_val, None) * C)


def dynamic_range_decompression(x: jnp.ndarray, C: float = 1.0):
    return jnp.exp(x) / C


class MelSpectrogram:
    """Log-mel feature extractor. Equivalent capability to the reference's
    TacotronSTFT.mel_spectrogram (reference: DEX-TTS/audio/stft.py:130-178):
    returns (log-mel (B, n_mels, T'), energy (B, T'))."""

    def __init__(
        self,
        n_fft: int = 1024,
        hop_length: int = 256,
        win_length: int = 1024,
        n_mels: int = 80,
        sample_rate: int = 22050,
        fmin: float = 0.0,
        fmax: float = 8000.0,
    ):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.mel_basis = jnp.asarray(
            mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
        )

    def __call__(self, y: jnp.ndarray):
        mag = stft_magnitude(y, self.n_fft, self.hop_length, self.win_length)
        mel = jnp.einsum("mf,bft->bmt", self.mel_basis, mag)
        log_mel = dynamic_range_compression(mel)
        energy = jnp.linalg.norm(mag, axis=1)
        return log_mel, energy


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "length"))
def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT by windowed overlap-add with window-sumsquare
    normalization (complex spec (B, F, T') → (B, T))."""
    window = jnp.asarray(_padded_window(n_fft, win_length))
    frames = jnp.fft.irfft(spec.swapaxes(1, 2), n=n_fft, axis=-1)  # (B, T', n_fft)
    frames = frames * window[None, None, :]

    b, n_frames, _ = frames.shape
    total = n_fft + hop_length * (n_frames - 1)

    # overlap-add via scatter-add on flat frame positions
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    ).reshape(-1)
    out = jnp.zeros((b, total), frames.dtype).at[:, idx].add(
        frames.reshape(b, -1)
    )
    wss = jnp.zeros((total,), frames.dtype).at[idx].add(
        jnp.tile(window**2, n_frames)
    )
    out = out / jnp.maximum(wss, 1e-10)[None, :]

    pad = n_fft // 2
    out = out[:, pad : total - pad]
    if length is not None:
        out = out[:, :length]
    return out


def griffin_lim(
    magnitudes: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_iters: int = 30,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Griffin-Lim phase recovery (debug vocoder).

    Capability equivalent of reference: DEX-TTS/audio/audio_processing.py:66-82,
    written as a lax.scan so all iterations compile into one graph.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    b, f, t = magnitudes.shape
    angles = jax.random.uniform(key, (b, f, t), minval=-np.pi, maxval=np.pi)
    phase = jnp.exp(1j * angles.astype(jnp.float32))

    def step(phase, _):
        signal = istft(magnitudes * phase, n_fft, hop_length, win_length)
        respec = _stft_complex(signal, n_fft, hop_length, win_length)
        new_phase = respec / jnp.maximum(jnp.abs(respec), 1e-8)
        return new_phase, None

    phase, _ = jax.lax.scan(step, phase, None, length=n_iters)
    return istft(magnitudes * phase, n_fft, hop_length, win_length)


def _stft_complex(y, n_fft, hop_length, win_length):
    window = jnp.asarray(_padded_window(n_fft, win_length))
    frames = frame_signal(y, n_fft, hop_length) * window[None, None, :]
    return jnp.fft.rfft(frames, n=n_fft, axis=-1).swapaxes(1, 2)
