import os

import numpy as np

from dex_tts_tpu.audio.wav import write_wav
from dex_tts_tpu.preprocess.filelists import make_filelist
from dex_tts_tpu.preprocess.preprocessor import (
    PreprocessConfig,
    Preprocessor,
    prepare_align,
)


def make_ljspeech_corpus(root, n=6, sr=22050):
    wav_dir = os.path.join(root, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        base = f"LJ001-{i:04d}"
        dur = 0.5 + 0.1 * i
        t = np.arange(int(sr * dur)) / sr
        wav = (0.5 * np.sin(2 * np.pi * (180 + 20 * i) * t)).astype(np.float32)
        wav += 0.01 * rng.standard_normal(len(wav)).astype(np.float32)
        write_wav(os.path.join(wav_dir, f"{base}.wav"), wav, sr)
        lines.append(f"{base}|Raw text {i}|Normalized text number {i}.")
    with open(os.path.join(root, "metadata.csv"), "w") as f:
        f.write("\n".join(lines))


def test_preprocess_ljspeech_end_to_end(tmp_path):
    corpus = os.path.join(tmp_path, "corpus")
    make_ljspeech_corpus(corpus)
    cfg = PreprocessConfig(
        corpus_path=corpus,
        raw_path=os.path.join(tmp_path, "raw"),
        out_path=os.path.join(tmp_path, "pre"),
    )
    prepare_align("LJSpeech", cfg)
    labs = [f for f in os.listdir(os.path.join(cfg.raw_path, "LJSpeech")) if f.endswith(".lab")]
    assert len(labs) == 6

    rows = Preprocessor(cfg).build_from_path()
    assert len(rows) == 6
    mel = np.load(rows[0]["mel_path"])
    assert mel.shape[1] == 80  # stored (T, n_mels)
    lf0_path = rows[0]["mel_path"].replace("/mel/", "/lf0/").replace("-mel-", "-lf0-")
    lf0 = np.load(lf0_path)
    assert lf0.shape[0] == mel.shape[0]
    voiced = lf0 != 0
    assert voiced.mean() > 0.5  # a sine is mostly voiced
    # lf0 of a ~180-220 Hz tone
    assert 150 < np.exp(np.median(lf0[voiced])) < 260

    counts = make_filelist(rows, os.path.join(tmp_path, "fl"), dataset="LJSpeech")
    assert counts["train"] + counts["valid"] + counts["test"] == 6
    with open(os.path.join(tmp_path, "fl", "train.txt")) as f:
        line = f.readline().strip().split("|")
    assert os.path.isfile(line[0])
    assert line[2] == "0"


def test_preprocess_libritts_prepare_align(tmp_path):
    """LibriTTS layout → raw_path/{spk}/ wav+lab; works from the corpus
    root (subset dirs) and from a single subset dir."""
    sr = 22050
    corpus = os.path.join(tmp_path, "LibriTTS")
    rng = np.random.default_rng(1)
    for spk, chap in (("19", "198"), ("26", "495")):
        chap_dir = os.path.join(corpus, "train-clean-100", spk, chap)
        os.makedirs(chap_dir)
        for utt in range(2):
            base = f"{spk}_{chap}_{utt:06d}_{0:06d}"
            wav = 0.3 * rng.standard_normal(sr // 2).astype(np.float32)
            write_wav(os.path.join(chap_dir, f"{base}.wav"), wav, sr)
            suffix = ".normalized.txt" if utt == 0 else ".original.txt"
            with open(os.path.join(chap_dir, base + suffix), "w") as f:
                f.write(f"Sentence {utt} of speaker {spk}.\n")

    cfg = PreprocessConfig(
        corpus_path=corpus,
        raw_path=os.path.join(tmp_path, "raw"),
        out_path=os.path.join(tmp_path, "pre"),
    )
    prepare_align("LibriTTS", cfg)
    for spk in ("19", "26"):
        names = sorted(os.listdir(os.path.join(cfg.raw_path, spk)))
        assert len([n for n in names if n.endswith(".lab")]) == 2
        assert len([n for n in names if n.endswith(".wav")]) == 2

    # pointing straight at the subset dir works too
    cfg2 = PreprocessConfig(
        corpus_path=os.path.join(corpus, "train-clean-100"),
        raw_path=os.path.join(tmp_path, "raw2"),
        out_path=os.path.join(tmp_path, "pre2"),
    )
    prepare_align("LibriTTS", cfg2)
    assert sorted(os.listdir(cfg2.raw_path)) == ["19", "26"]

    # ADVICE r4: a stray numeric-named FILE at the corpus root must not
    # flip the layout detection to "root is a subset dir" (which silently
    # processed nothing from the real subset dirs)
    with open(os.path.join(corpus, "1234"), "w") as f:
        f.write("stray file\n")
    cfg3 = PreprocessConfig(
        corpus_path=corpus,
        raw_path=os.path.join(tmp_path, "raw3"),
        out_path=os.path.join(tmp_path, "pre3"),
    )
    prepare_align("LibriTTS", cfg3)
    assert sorted(os.listdir(cfg3.raw_path)) == ["19", "26"]

    # neither layout → loud warning, nothing written
    import pytest

    empty = os.path.join(tmp_path, "empty")
    os.makedirs(empty)
    cfg4 = PreprocessConfig(
        corpus_path=empty,
        raw_path=os.path.join(tmp_path, "raw4"),
        out_path=os.path.join(tmp_path, "pre4"),
    )
    with pytest.warns(UserWarning, match="neither LibriTTS layout"):
        prepare_align("LibriTTS", cfg4)


def test_filelist_unseen_speakers(tmp_path):
    rows = [
        {"mel_path": f"m{i}", "text": "t", "speaker_id": i % 4, "n_frames": 100}
        for i in range(40)
    ]
    counts = make_filelist(
        rows, os.path.join(tmp_path, "fl"), dataset="VCTK", unseen_speakers=[3]
    )
    assert counts["test_unseen"] == 10
    with open(os.path.join(tmp_path, "fl", "train_unseen.txt")) as f:
        for line in f:
            assert line.strip().split("|")[2] != "3"


def test_filelist_duration_filter(tmp_path):
    rows = [
        {"mel_path": f"m{i}", "text": "t", "speaker_id": 0, "n_frames": i * 50}
        for i in range(10)
    ]
    counts = make_filelist(
        rows, os.path.join(tmp_path, "fl"), min_frames=100, max_frames=300
    )
    assert sum(counts.values()) == 5  # frames 100,150,200,250,300


def test_preprocess_text_frontend():
    """Extended (pinyin/MFA) frontend: inventory parity with the reference
    preprocess/text package and round-trip through {phone} spans
    (reference: DEX-TTS/preprocess/text/__init__.py:15-55, pinyin.py)."""
    from dex_tts_tpu.preprocess.text_frontend import (
        MANDARIN_FINALS,
        MANDARIN_INITIALS,
        PINYIN_SYMBOLS,
        clean_text,
        sequence_to_text,
        symbols,
        text_to_sequence,
    )

    assert len(MANDARIN_INITIALS) == 23
    assert len(MANDARIN_FINALS) == 37 * 5
    assert PINYIN_SYMBOLS[-1] == "rr"
    # [pad] + special + punct + letters + arpabet + pinyin + silences
    assert len(symbols) == 1 + 1 + 10 + 52 + 84 + len(PINYIN_SYMBOLS) + 3
    assert len(set(symbols)) == len(symbols)

    # .lab cleaning matches the main cleaner pipeline behavior
    assert clean_text("Dr. Strange  reads 2 books!") == (
        "doctor strange reads two books!"
    )

    ids = text_to_sequence("go {sp HH AH0 l ou2 sil} now")
    assert ids, "non-empty sequence"
    assert sequence_to_text(ids) == "go {sp HH AH0 l ou2 sil} now"

    # pinyin finals and silences resolve to ids; unknown phones are dropped
    a = text_to_sequence("{zh ang4 rr}")
    b = text_to_sequence("{zh ang4 rr BOGUS}")
    assert a == b and len(a) == 3
