import json
import os

import numpy as np

from dex_tts_tpu.eval.metric import cer, mean_and_stderr, mel_mae, normalize_transcript, wer
from dex_tts_tpu.utils.logging import MetricsLogger
from dex_tts_tpu.utils.profiling import StepTimer, annotate


def test_wer_cer():
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the cat sat", "the dog sat") == 1 / 3
    assert wer("a b c", "a c") == 1 / 3  # one deletion
    assert wer("", "") == 0.0
    assert wer("", "word") == 1.0
    assert cer("abc", "abc") == 0.0
    assert cer("abc", "abd") == 1 / 3
    # normalization: case + punctuation insensitive
    assert wer("Hello, World!", "hello world") == 0.0
    assert normalize_transcript("It's Fine.") == "IT'S FINE"


def test_mel_mae_crops_to_shorter():
    a = np.zeros((4, 10))
    b = np.ones((4, 7))
    assert mel_mae(a, b) == 1.0


def test_mean_and_stderr():
    mean, se = mean_and_stderr([1.0, 2.0, 3.0])
    assert np.isclose(mean, 2.0)
    assert np.isclose(se, np.std([1, 2, 3], ddof=1) / np.sqrt(3))
    mean, se = mean_and_stderr([])
    assert np.isnan(mean)


def test_metrics_logger(tmp_path):
    logger = MetricsLogger(str(tmp_path))
    logger.log(1, {"loss": 2.5}, prefix="train/")
    logger.log(2, {"loss": 2.0}, prefix="train/")
    lines = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    assert len(lines) == 2
    assert lines[0]["step"] == 1
    assert lines[1]["train/loss"] == 2.0


def test_step_timer():
    timer = StepTimer(warmup=1)
    for _ in range(4):
        with timer:
            pass
    assert timer.total_steps == 4
    assert len(timer.times) == 3
    assert "steps" in timer.summary()
    with annotate("span"):
        pass


def test_gt_wav_path():
    from dex_tts_tpu.eval.evaluation import gt_wav_path

    assert (
        gt_wav_path("/data/out/mel/p225/p225-mel-p225_001.npy")
        == "/data/out/wav/p225/p225_001.wav"
    )
    # already a wav: unchanged
    assert gt_wav_path("/data/wavs/a.wav") == "/data/wavs/a.wav"
    # unknown layout: empty (no crash)
    assert gt_wav_path("/data/out/feats/x.npy") == ""


def test_compile_cache_gated_by_backend(tmp_path):
    """enable_compile_cache refuses non-TPU backends (CPU AOT reload can
    SIGILL — CLAUDE.md) unless forced; forced, it points JAX's persistent
    cache at the dir and creates it."""
    import warnings

    import jax

    from dex_tts_tpu.utils.compile_cache import enable_compile_cache

    cache_dir = os.path.join(tmp_path, "xla_cache")
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            assert enable_compile_cache(cache_dir) is False
        assert any("compile cache" in str(w.message) for w in caught)
        assert not os.path.isdir(cache_dir)
        assert jax.config.jax_compilation_cache_dir == prev_dir

        assert enable_compile_cache(cache_dir, force=True) is True
        assert os.path.isdir(cache_dir)
        assert jax.config.jax_compilation_cache_dir == cache_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", prev_size
        )


def test_mel_cepstral_distortion():
    from dex_tts_tpu.eval.metric import mel_cepstral_distortion, mel_to_cepstra

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((80, 60)).astype(np.float32)

    # identity → 0
    assert mel_cepstral_distortion(mel, mel) == 0.0

    # cepstra shape and c0 (energy) removal: a constant offset over the
    # mel axis only moves c0, so MCD is invariant to global gain
    cep = mel_to_cepstra(mel)
    assert cep.shape == (60, 13)
    assert abs(mel_cepstral_distortion(mel, mel + 3.0)) < 1e-4

    # spectral noise → positive, monotone in noise scale
    small = mel_cepstral_distortion(mel, mel + 0.1 * rng.standard_normal(mel.shape))
    large = mel_cepstral_distortion(mel, mel + 1.0 * rng.standard_normal(mel.shape))
    assert 0 < small < large

    # DTW absorbs a pure time-stretch: doubling every frame barely moves
    # the score while a same-length comparison of misaligned content would
    stretched = np.repeat(mel, 2, axis=1)
    assert mel_cepstral_distortion(mel, stretched) < 1e-4


def test_mfu_accounting():
    """The two XLA facts utils/mfu.py is built on, plus the arithmetic:
    (a) Compiled.cost_analysis counts a scan body once regardless of trip
    count — the reason flop counting uses fully-unrolled twins; (b)
    Lowered (pre-compile) cost analysis of the unrolled graph counts
    every iteration; (c) peak/None propagation off-TPU."""
    import jax
    import jax.numpy as jnp

    from dex_tts_tpu.utils.mfu import lowered_flops, mfu, peak_flops_per_chip

    n, steps = 64, 10
    matmul_flops = 2 * n**3  # one n×n @ n×n

    def make(unroll):
        def f(x):
            c, _ = jax.lax.scan(
                lambda c, _: (c @ c, None), x, None, length=steps,
                unroll=unroll,
            )
            return c
        return f

    x = jnp.ones((n, n))
    rolled = jax.jit(make(1)).lower(x).compile().cost_analysis()
    if isinstance(rolled, (list, tuple)):
        rolled = rolled[0]
    # (a) the compiled rolled scan prices ~one body, not `steps` bodies
    assert rolled["flops"] < 2 * matmul_flops

    # (b) the lowered unrolled twin prices all iterations
    flops = lowered_flops(jax.jit(make(steps)), x)
    assert flops is not None
    assert abs(flops - steps * matmul_flops) < 0.1 * steps * matmul_flops

    # (c) CPU backend: no peak → mfu None; flops still reported
    assert peak_flops_per_chip() is None
    assert mfu(flops, 1.0) is None
    assert mfu(None, 1.0) is None


def test_mfu_extrapolated_scan_flops():
    """F(1)/F(2) unroll extrapolation reproduces the true scan flop count
    without tracing all `steps` body copies."""
    import jax
    import jax.numpy as jnp

    from dex_tts_tpu.utils.mfu import extrapolated_scan_flops

    n, steps = 64, 50
    matmul_flops = 2 * n**3

    def twin(u):
        def f(x):
            y = x @ x  # non-loop part A (one matmul)
            c, _ = jax.lax.scan(
                lambda c, _: (c @ c, None), y, None, length=steps, unroll=u
            )
            return c
        return jax.jit(f)

    x = jnp.ones((n, n))
    total = extrapolated_scan_flops(twin, steps, x)
    expected = (1 + steps) * matmul_flops  # A + steps·B
    assert total is not None
    assert abs(total - expected) < 0.05 * expected


def test_build_init_batch_dataset_free_fallback():
    """r5: synthesize.py/serve.py must not require a prepared dataset —
    when the config's val filelist is absent, build_init_batch falls
    back to a synthetic shapes-only batch (the reference CLI needs no
    dataset either, DEX-TTS/synthesize.py:64-113); objective eval still
    demands real items and says so."""
    import numpy as np
    import pytest

    from dex_tts_tpu.eval.evaluation import build_init_batch
    from dex_tts_tpu.utils import Config

    cfg = Config({
        "model_family": "gedex",
        "path": {"val_path": "/nonexistent/valid.txt"},
        "model": {"n_feats": 80},
    })
    batch = build_init_batch(cfg)
    assert batch["x"].dtype == np.int32
    assert batch["y"].shape == (1, 80, 64)
    assert "ref" not in batch

    cfg_dex = Config({
        "model_family": "dex",
        "path": {"val_path": "/nonexistent/valid.txt"},
        "model": {"n_feats": 80},
    })
    b2 = build_init_batch(cfg_dex)
    for key in ("ref", "sty", "lf0"):
        assert key in b2, key
    assert b2["lf0"].shape == (1, 64)
