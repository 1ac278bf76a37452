"""Execute the REAL objective-eval ASR backend once (VERDICT round-3 §6).

reference: DEX-TTS/src/metric.py:17-45 runs wav2vec2 transcription before
CER/WER. The pretrained checkpoint needs a network download (absent in this
image — evidence in docs/API.md), but the inference *code path* is identical
for a locally-built random-init wav2vec2: ASRScorer("random-init")
constructs the same Wav2Vec2Processor/Wav2Vec2ForCTC stack offline, so
resample → feature-extract → CTC forward → argmax decode → normalize →
CER/WER all execute for real. Scores from random weights are meaningless;
these tests assert the plumbing, not quality.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from dex_tts_tpu.eval.metric import ASRScorer, cer, wer  # noqa: E402


@pytest.fixture(scope="module")
def scorer():
    s = ASRScorer("random-init")
    if not s.available:
        pytest.fail(
            "random-init ASR backend must construct offline — "
            "its whole point is validating the real path without downloads"
        )
    return s


def test_asr_random_init_transcribes(scorer):
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(22050 // 2)).astype(np.float32)
    hyp = scorer.transcribe(wav, sample_rate=22050)
    # real decode returns a (possibly empty) string, never None
    assert isinstance(hyp, str)
    # random argmax may hit special tokens (<unk>/<s>) a trained checkpoint
    # wouldn't; outside those, the vocabulary is closed (A-Z, ', space)
    for tok in ("<unk>", "<s>", "</s>", "<pad>"):
        hyp = hyp.replace(tok, " ")
    assert all(c.isupper() or c in " '" for c in hyp)


def test_asr_random_init_feeds_cer_wer(scorer):
    rng = np.random.default_rng(1)
    wav = (0.1 * rng.standard_normal(22050)).astype(np.float32)
    hyp = scorer.transcribe(wav, sample_rate=22050)
    ref = "THE QUICK BROWN FOX"
    c, w = cer(ref, hyp), wer(ref, hyp)
    assert np.isfinite(c) and c >= 0.0
    assert np.isfinite(w) and w >= 0.0


def test_asr_random_init_deterministic(scorer):
    rng = np.random.default_rng(2)
    wav = (0.1 * rng.standard_normal(22050)).astype(np.float32)
    assert scorer.transcribe(wav) == scorer.transcribe(wav)


# ---------------------------------------------------------------------------
# Speaker backend: built-in GE2E d-vector encoder (eval/speaker.py)
# ---------------------------------------------------------------------------

import jax.numpy as jnp  # noqa: E402

from dex_tts_tpu.eval import speaker  # noqa: E402
from dex_tts_tpu.eval.metric import SpeakerScorer  # noqa: E402


def test_speaker_encoder_matches_torch_twin():
    """Bit-level claim of eval/speaker.py: given the same weights, the JAX
    network equals resemblyzer's torch VoiceEncoder stack (3-layer
    LSTM-256 -> Linear -> ReLU -> row L2 norm).

    reference: DEX-TTS/src/metric.py:15-22 (VoiceEncoder usage)."""
    import torch

    torch.manual_seed(0)
    lstm = torch.nn.LSTM(speaker.N_MELS, speaker.HIDDEN,
                         speaker.N_LAYERS, batch_first=True)
    linear = torch.nn.Linear(speaker.HIDDEN, speaker.EMBED)
    state = {f"lstm.{k}": v for k, v in lstm.state_dict().items()}
    state |= {f"linear.{k}": v for k, v in linear.state_dict().items()}

    params = {k: jnp.asarray(v) for k, v in
              speaker.load_torch_state_dict(state).items()}
    rng = np.random.default_rng(3)
    frames = rng.standard_normal((4, 160, speaker.N_MELS)).astype(np.float32)

    with torch.no_grad():
        _, (hidden, _) = lstm(torch.from_numpy(frames))
        raw = torch.relu(linear(hidden[-1]))
        want = (raw / torch.norm(raw, dim=1, keepdim=True)).numpy()

    got = np.asarray(speaker.embed_frames(params, jnp.asarray(frames)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_speaker_state_dict_loader_validates():
    full = speaker.init_params()
    assert set(speaker.load_torch_state_dict(dict(full))) == set(full)
    # resemblyzer envelope + DataParallel prefixes unwrap
    wrapped = {"model_state": {f"module.{k}": v for k, v in full.items()}}
    assert set(speaker.load_torch_state_dict(wrapped)) == set(full)
    incomplete = {k: v for k, v in full.items() if k != "linear.bias"}
    with pytest.raises(ValueError, match="linear.bias"):
        speaker.load_torch_state_dict(incomplete)


@pytest.fixture(scope="module")
def builtin_encoder():
    return speaker.BuiltinVoiceEncoder(weights=None)


def test_speaker_embed_utterance_shape_and_norm(builtin_encoder):
    rng = np.random.default_rng(4)
    wav = (0.1 * rng.standard_normal(3 * 22050)).astype(np.float32)
    emb = builtin_encoder.embed_utterance(wav, source_sr=22050)
    assert emb.shape == (speaker.EMBED,)
    assert abs(float(np.linalg.norm(emb)) - 1.0) < 1e-5
    # deterministic
    emb2 = builtin_encoder.embed_utterance(wav, source_sr=22050)
    np.testing.assert_array_equal(emb, emb2)


def test_speaker_short_utterance_padded(builtin_encoder):
    rng = np.random.default_rng(5)
    wav = (0.1 * rng.standard_normal(1600)).astype(np.float32)  # 0.1 s
    emb = builtin_encoder.embed_utterance(wav)
    assert emb.shape == (speaker.EMBED,)
    assert np.isfinite(emb).all()


def test_speaker_partial_slices_cover_exactly():
    for n in (10, 160, 161, 240, 400, 999):
        slices = speaker.compute_partial_slices(n)
        assert slices[0].start == 0 and slices[-1].stop == n
        if n > speaker.PARTIAL_FRAMES:
            assert all(s.stop - s.start == speaker.PARTIAL_FRAMES
                       for s in slices)
        # monotone, no gaps between consecutive windows
        for a, b in zip(slices, slices[1:]):
            assert b.start <= a.stop


def test_speaker_scorer_random_init_cosine():
    scorer = SpeakerScorer(backend="random-init")
    assert scorer.available and scorer.builtin.random_init
    rng = np.random.default_rng(6)
    # 3 s clips: short ones get zero-padded to the 1.6 s partial length and
    # the random LSTM's state forgets the input over the zero tail
    a = (0.1 * rng.standard_normal(3 * 22050)).astype(np.float32)
    b = (0.1 * rng.standard_normal(3 * 22050)).astype(np.float32)
    same = scorer.cosine(a, a)
    cross = scorer.cosine(a, b)
    assert abs(same - 1.0) < 1e-5
    assert -1.0 - 1e-6 <= cross <= 1.0 + 1e-6
    # the random init is deliberately input-sensitive (init_params widens
    # the first-layer draw) so an input-ignoring bug shows up here
    assert cross < same - 1e-4


def test_speaker_scorer_backend_validation():
    with pytest.raises(ValueError, match="weights path"):
        SpeakerScorer(backend="builtin")
    with pytest.raises(ValueError, match="unknown speaker backend"):
        SpeakerScorer(backend="ge2e")
    # resemblyzer is absent in this image: FORCING it raises (ADVICE r4 —
    # an explicitly requested backend must not degrade quietly);
    # auto without weights falls through to unavailable (cosine -> None)
    with pytest.raises(ImportError, match="forced"):
        SpeakerScorer(backend="resemblyzer")
    auto = SpeakerScorer()
    assert auto.available is False
    assert auto.cosine(np.zeros(100, np.float32),
                       np.zeros(100, np.float32)) is None


def test_speaker_scorer_builtin_weights_file(tmp_path):
    """--spk_encoder path: a saved torch checkpoint loads through the
    'auto' backend and produces real embeddings."""
    import torch

    path = tmp_path / "pretrained.pt"
    torch.save(
        {"model_state": {k: torch.from_numpy(v)
                         for k, v in speaker.init_params(seed=7).items()}},
        path,
    )
    scorer = SpeakerScorer(weights=str(path))
    assert scorer.available and not scorer.builtin.random_init
    rng = np.random.default_rng(8)
    wav = (0.1 * rng.standard_normal(22050)).astype(np.float32)
    assert abs(scorer.cosine(wav, wav) - 1.0) < 1e-5


def test_speaker_scorer_random_init_rejects_weights(tmp_path):
    with pytest.raises(ValueError, match="ignores weights"):
        SpeakerScorer(backend="random-init", weights=str(tmp_path / "x.pt"))


def test_speaker_loader_reports_unexpected_keys():
    full = speaker.init_params()
    extra = dict(full)
    extra["lstm.weight_ih_l3"] = full["lstm.weight_ih_l1"]
    with pytest.raises(ValueError, match="unexpected.*weight_ih_l3"):
        speaker.load_torch_state_dict(extra)


def test_speaker_16k_input_is_preprocessed(builtin_encoder):
    """16 kHz input must take the same normalize/trim path as any other
    rate — the resemblyzer branch always preprocesses, so the builtin
    must too or identical weights would give different cosines."""
    rng = np.random.default_rng(9)
    quiet = (1e-3 * rng.standard_normal(3 * 16000)).astype(np.float32)
    via_16k = builtin_encoder.embed_utterance(quiet, source_sr=16000)
    manual = builtin_encoder.embed_utterance(
        speaker.preprocess_wav(quiet, 16000), preprocess=False
    )
    np.testing.assert_allclose(via_16k, manual, rtol=1e-6, atol=1e-7)
    # and preprocessing actually changed the input (volume normalize)
    raw = builtin_encoder.embed_utterance(quiet, preprocess=False)
    assert not np.allclose(via_16k, raw)


def test_speaker_vad_moving_average_matches_resemblyzer():
    """The smoothing window is [i-3, i+4] (asymmetric zero pad), the
    dilation a 7-wide centered structuring element — resemblyzer's
    moving_average + binary_dilation(ones(max_silence+1)) semantics."""
    from scipy.ndimage import binary_dilation

    rng = np.random.default_rng(10)
    # speech / 300 ms pause / speech at -30 dBFS-ish levels, 16 kHz
    loud = 0.1 * rng.standard_normal(16000)
    pause = 1e-4 * rng.standard_normal(10 * speaker._VAD_WINDOW)
    wav = np.concatenate([loud, pause, loud]).astype(np.float32)
    got = speaker.trim_long_silences(wav)

    n_win = len(wav) // speaker._VAD_WINDOW
    w = wav[: n_win * speaker._VAD_WINDOW]
    rms = np.sqrt(np.mean(w.reshape(n_win, -1) ** 2, axis=1))
    flags = (rms > 10.0 ** (-45.0 / 20.0)).astype(np.float32)
    width = speaker._VAD_SMOOTH
    padded = np.concatenate([np.zeros((width - 1) // 2), flags,
                             np.zeros(width // 2)])
    csum = np.cumsum(padded)
    mov = np.empty(n_win)
    mov[0] = csum[width - 1] / width
    mov[1:] = (csum[width:] - csum[:-width]) / width
    mask = binary_dilation(
        mov > 0.5, np.ones(speaker._VAD_MAX_SILENCE + 1, bool)
    )
    want = w[np.repeat(mask, speaker._VAD_WINDOW)]
    np.testing.assert_array_equal(got, want)
    assert len(got) < len(wav)  # some of the pause was trimmed


def test_speaker_partial_count_bucketed(builtin_encoder, monkeypatch):
    """Utterances with different partial counts in the same pow2 bucket
    must reuse one compiled embed (no per-length recompiles on the
    remote-compile TPU backend)."""
    calls = []
    real = builtin_encoder._embed
    monkeypatch.setattr(
        builtin_encoder, "_embed",
        lambda p, f: (calls.append(f.shape), real(p, f))[1],
    )
    rng = np.random.default_rng(11)
    for seconds in (3.0, 3.4, 3.8):  # 3-4 partials -> all bucket to 4
        wav = (0.1 * rng.standard_normal(int(seconds * 16000))).astype(
            np.float32
        )
        builtin_encoder.embed_utterance(wav)
    assert len({s[0] for s in calls}) == 1, calls
