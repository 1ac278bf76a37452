"""Self-contained GE2E d-vector speaker encoder (Resemblyzer-compatible).

reference: DEX-TTS/src/metric.py:15-22,69-95 — the reference's objective
eval scores speaker similarity with resemblyzer's ``VoiceEncoder``
(3-layer LSTM-256 → Linear(256) → ReLU → per-utterance L2 norm over
40-channel 16 kHz mel frames, the GE2E d-vector network). resemblyzer is
not installable in this image, so the network is reimplemented here in
JAX with a loader for resemblyzer's torch ``pretrained.pt`` state dict:

- **Bit-level claim (tested):** given the same weights, `embed_frames`
  matches the torch LSTM/Linear stack numerically
  (tests/test_eval_backends.py torch-twin parity) — a user who supplies
  resemblyzer's released weights file gets the real metric.
- **Best-effort (documented divergence):** preprocessing reuses this
  repo's DSP — polyphase resample to 16 kHz (vs librosa's kaiser_best),
  a numpy mel front-end numerically matching ``librosa.feature.
  melspectrogram(n_fft=400, hop=160, n_mels=40)`` (power mel, no log —
  resemblyzer feeds raw power mels), and an energy VAD approximating
  resemblyzer's webrtcvad silence trimming (webrtcvad is used instead
  when importable).

Random-init construction (``BuiltinVoiceEncoder(weights=None)``) exists
only to execute the full code path offline — its cosines are
meaningless; never report them (same contract as
``metric.ASRScorer("random-init")``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from dex_tts_tpu.audio.mel import mel_filterbank
from dex_tts_tpu.audio.wav import resample

SAMPLE_RATE = 16000
N_FFT = 400          # 25 ms window (resemblyzer mel_window_length)
HOP = 160            # 10 ms step (mel_window_step)
N_MELS = 40
PARTIAL_FRAMES = 160  # 1.6 s partial utterances (partials_n_frames)
HIDDEN = 256
EMBED = 256
N_LAYERS = 3
TARGET_DBFS = -30.0   # audio_norm_target_dBFS

_VAD_WINDOW = 480          # 30 ms (vad_window_length)
_VAD_SMOOTH = 8            # vad_moving_average_width
_VAD_MAX_SILENCE = 6       # vad_max_silence_length (windows)


# ---------------------------------------------------------------------------
# preprocessing (host-side numpy — eval-only, not a hot path)
# ---------------------------------------------------------------------------

def wav_to_mel_frames(wav: np.ndarray) -> np.ndarray:
    """(T,) 16 kHz float wav → (n_frames, 40) power-mel frames.

    Matches ``librosa.feature.melspectrogram(y, 16000, n_fft=400,
    hop_length=160, n_mels=40).T`` (center=True reflect pad, periodic
    hann, power=2, slaney filterbank) — resemblyzer/audio.py's
    wav_to_mel_spectrogram. No log compression: the GE2E net consumes
    raw power mels."""
    wav = np.asarray(wav, np.float32)
    pad = N_FFT // 2
    if len(wav) < 1:
        wav = np.zeros(1, np.float32)
    # np.pad reflect needs len > pad; fall back to zero pad for stubs
    mode = "reflect" if len(wav) > pad else "constant"
    y = np.pad(wav, pad, mode=mode)
    n_frames = 1 + (len(y) - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = y[idx] * np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (n_frames, 201)
    fbank = _mel_basis()
    return (spec @ fbank.T).astype(np.float32)


_MEL_CACHE: np.ndarray | None = None


def _mel_basis() -> np.ndarray:
    global _MEL_CACHE
    if _MEL_CACHE is None:
        _MEL_CACHE = mel_filterbank(SAMPLE_RATE, N_FFT, N_MELS).astype(
            np.float32
        )
    return _MEL_CACHE


def normalize_volume(wav: np.ndarray, target_dbfs: float = TARGET_DBFS,
                     increase_only: bool = False,
                     decrease_only: bool = False) -> np.ndarray:
    """Scale to a target mean-power dBFS (resemblyzer/audio.py:49-58)."""
    power = float(np.mean(np.square(wav)))
    if power <= 0.0:
        return wav
    dbfs_change = target_dbfs - 10.0 * np.log10(power)
    if (dbfs_change < 0 and increase_only) or (
            dbfs_change > 0 and decrease_only):
        return wav
    return (wav * (10.0 ** (dbfs_change / 20.0))).astype(np.float32)


def trim_long_silences(wav: np.ndarray) -> np.ndarray:
    """Remove long silent stretches (resemblyzer/audio.py:61-102).

    Uses webrtcvad when importable (the reference's exact detector);
    otherwise an energy VAD on the same 30 ms grid: voiced = window RMS
    above -45 dBFS (signal is already normalized to -30), smoothed with
    the same width-8 asymmetric moving average and dilated with the same
    (max_silence+1)-wide structuring element."""
    n_windows = len(wav) // _VAD_WINDOW
    if n_windows < _VAD_SMOOTH:
        return wav
    wav_t = wav[: n_windows * _VAD_WINDOW]
    try:  # pragma: no cover - webrtcvad not in this image
        import webrtcvad

        vad = webrtcvad.Vad(3)
        pcm = (np.clip(wav_t, -1, 1) * 32767).astype(np.int16).tobytes()
        flags = np.array([
            vad.is_speech(
                pcm[i * _VAD_WINDOW * 2:(i + 1) * _VAD_WINDOW * 2],
                sample_rate=SAMPLE_RATE,
            )
            for i in range(n_windows)
        ], np.float32)
    except Exception:
        rms = np.sqrt(
            np.mean(wav_t.reshape(n_windows, _VAD_WINDOW) ** 2, axis=1)
        )
        flags = (rms > 10.0 ** (-45.0 / 20.0)).astype(np.float32)
    # width-8 moving average then binarize — resemblyzer's asymmetric
    # window [i-3, i+4] (zero-pad (w-1)//2 left, w//2 right), not
    # convolve-'same' whose even-width window is the mirror [i-4, i+3]
    padded = np.concatenate([
        np.zeros((_VAD_SMOOTH - 1) // 2, np.float32), flags,
        np.zeros(_VAD_SMOOTH // 2, np.float32),
    ])
    csum = np.cumsum(padded, dtype=np.float64)
    csum[_VAD_SMOOTH:] = csum[_VAD_SMOOTH:] - csum[:-_VAD_SMOOTH]
    mask = (csum[_VAD_SMOOTH - 1:] / _VAD_SMOOTH) > 0.5
    if not mask.any():
        return wav
    # binary_dilation with a (max_silence+1)-wide structuring element:
    # width 7 centered ⇒ ±3 windows kept around speech
    width = _VAD_MAX_SILENCE + 1
    dil = np.zeros_like(mask)
    for off in range(-((width - 1) // 2), width // 2 + 1):
        lo, hi = max(0, off), min(n_windows, n_windows + off)
        dil[lo:hi] |= mask[max(0, -off): n_windows - max(0, off)]
    # resemblyzer discards the sub-window tail entirely
    return wav_t[np.repeat(dil, _VAD_WINDOW)]


def preprocess_wav(wav: np.ndarray, source_sr: int) -> np.ndarray:
    """resemblyzer.preprocess_wav equivalent: resample to 16 kHz,
    normalize to -30 dBFS (increase only), trim long silences."""
    wav = resample(np.asarray(wav, np.float32), source_sr, SAMPLE_RATE)
    wav = normalize_volume(wav, TARGET_DBFS, increase_only=True)
    return trim_long_silences(wav)


# ---------------------------------------------------------------------------
# the GE2E network (JAX, torch-layout params)
# ---------------------------------------------------------------------------

def init_params(seed: int = 0) -> dict[str, np.ndarray]:
    """Random params in torch ``state_dict`` layout (uniform ±1/√H, the
    torch.nn.LSTM/Linear default).

    The first layer's input weights are drawn 300× wider: power mels of
    -30 dBFS audio are ~1e-3, and at the torch default scale they vanish
    through the gates — every utterance then embeds to the same
    bias-driven point and the random-init plumbing path could not detect
    an input-ignoring bug. The wider draw keeps embeddings measurably
    input-sensitive (tests/test_eval_backends.py asserts it)."""
    rng = np.random.default_rng(seed)
    k = 1.0 / np.sqrt(HIDDEN)

    def u(*shape):
        return rng.uniform(-k, k, shape).astype(np.float32)

    params: dict[str, np.ndarray] = {}
    for layer in range(N_LAYERS):
        in_dim = N_MELS if layer == 0 else HIDDEN
        params[f"lstm.weight_ih_l{layer}"] = u(4 * HIDDEN, in_dim)
        if layer == 0:
            params["lstm.weight_ih_l0"] = (
                300.0 * params["lstm.weight_ih_l0"]
            ).astype(np.float32)
        params[f"lstm.weight_hh_l{layer}"] = u(4 * HIDDEN, HIDDEN)
        params[f"lstm.bias_ih_l{layer}"] = u(4 * HIDDEN)
        params[f"lstm.bias_hh_l{layer}"] = u(4 * HIDDEN)
    params["linear.weight"] = u(EMBED, HIDDEN)
    params["linear.bias"] = u(EMBED)
    return params


def load_torch_state_dict(source) -> dict[str, np.ndarray]:
    """Load resemblyzer's ``pretrained.pt`` (or any state dict of the
    same network) into the torch-layout param dict this module uses.

    Accepts a path or an in-memory mapping; unwraps the ``model_state``
    envelope resemblyzer ships and strips ``module.`` DataParallel
    prefixes."""
    if isinstance(source, (str, bytes)) or hasattr(source, "__fspath__"):
        import torch

        source = torch.load(source, map_location="cpu")
    if "model_state" in source:  # resemblyzer checkpoint envelope
        source = source["model_state"]
    out: dict[str, np.ndarray] = {}
    for key, val in source.items():
        key = key.removeprefix("module.")
        if key.startswith(("lstm.", "linear.")):
            out[key] = np.asarray(
                val.detach().cpu().numpy()
                if hasattr(val, "detach") else val,
                np.float32,
            )
    expected = set(init_params())
    if set(out) != expected:
        missing = sorted(expected - set(out))
        unexpected = sorted(set(out) - expected)
        raise ValueError(
            f"speaker-encoder state dict mismatch: missing {missing}, "
            f"unexpected {unexpected}"
        )
    return out


def _lstm_layer(x: jnp.ndarray, w_ih, w_hh, b_ih, b_hh):
    """One torch-semantics LSTM layer over (B, T, in) → (B, T, H), final h.

    Gate order i,f,g,o matches torch.nn.LSTM's weight layout."""
    hid = w_hh.shape[1]
    batch = x.shape[0]

    def step(carry, xt):
        h, c = carry
        gates = xt @ w_ih.T + b_ih + h @ w_hh.T + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((batch, hid), x.dtype), jnp.zeros((batch, hid), x.dtype))
    (h, _), ys = lax.scan(step, init, jnp.swapaxes(x, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h


def embed_frames(params: dict, frames: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 40) mel frames → (B, 256) unit-norm d-vectors.

    The VoiceEncoder.forward contract: last layer's final hidden state →
    Linear → ReLU → row-wise L2 normalization."""
    x = frames
    h_last = None
    for layer in range(N_LAYERS):
        x, h_last = _lstm_layer(
            x,
            params[f"lstm.weight_ih_l{layer}"],
            params[f"lstm.weight_hh_l{layer}"],
            params[f"lstm.bias_ih_l{layer}"],
            params[f"lstm.bias_hh_l{layer}"],
        )
    raw = jax.nn.relu(h_last @ params["linear.weight"].T
                      + params["linear.bias"])
    return raw / jnp.maximum(
        jnp.linalg.norm(raw, axis=-1, keepdims=True), 1e-8
    )


def compute_partial_slices(n_frames: int,
                           overlap: float = 0.5) -> list[slice]:
    """1.6 s (160-frame) partial windows at 50% overlap; the trailing
    partial is kept by sliding it back flush with the end (so coverage
    is exact, resemblyzer's min_pad_coverage concern doesn't arise)."""
    if n_frames <= PARTIAL_FRAMES:
        return [slice(0, n_frames)]
    step = max(1, int(round(PARTIAL_FRAMES * (1.0 - overlap))))
    starts = list(range(0, n_frames - PARTIAL_FRAMES + 1, step))
    if starts[-1] + PARTIAL_FRAMES < n_frames:
        starts.append(n_frames - PARTIAL_FRAMES)
    return [slice(s, s + PARTIAL_FRAMES) for s in starts]


class BuiltinVoiceEncoder:
    """GE2E d-vector encoder without the resemblyzer package.

    ``weights`` is a path to resemblyzer's ``pretrained.pt`` (real
    metric) or None for random init (plumbing-only; see module
    docstring)."""

    def __init__(self, weights: str | None = None, seed: int = 0):
        self.random_init = weights is None
        raw = init_params(seed) if weights is None else (
            load_torch_state_dict(weights)
        )
        self.params = {k: jnp.asarray(v) for k, v in raw.items()}
        self._embed = jax.jit(embed_frames)

    def embed_utterance(self, wav: np.ndarray,
                        source_sr: int = SAMPLE_RATE,
                        preprocess: bool = True) -> np.ndarray:
        """Raw wav → (256,) unit-norm utterance embedding (mean of
        partial embeddings, renormalized — VoiceEncoder.embed_utterance).

        Preprocessing (resample/normalize/trim) always runs so 16 kHz
        input takes the same path as any other rate — resample is a
        no-op there; pass preprocess=False only for already-preprocessed
        wavs (resemblyzer's own calling convention)."""
        if preprocess:
            wav = preprocess_wav(wav, source_sr)
        mels = wav_to_mel_frames(wav)
        if len(mels) < PARTIAL_FRAMES:
            mels = np.pad(mels, ((0, PARTIAL_FRAMES - len(mels)), (0, 0)))
        parts = np.stack([mels[s] for s in
                          compute_partial_slices(len(mels))])
        # pad the partial count to the next pow2: the jitted scan would
        # otherwise recompile for every distinct utterance length —
        # ruinous on the remote-compile TPU backend (CLAUDE.md)
        n = len(parts)
        bucket = 1 << (n - 1).bit_length()
        if bucket > n:
            parts = np.pad(parts, ((0, bucket - n), (0, 0), (0, 0)))
        embeds = np.asarray(self._embed(self.params, jnp.asarray(parts)))
        mean = embeds[:n].mean(axis=0)
        return mean / max(float(np.linalg.norm(mean)), 1e-8)
