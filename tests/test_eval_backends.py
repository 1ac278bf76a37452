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
