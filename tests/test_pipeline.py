import jax
import numpy as np
import pytest

from dex_tts_tpu.audio.pitch import extract_f0, extract_lf0
from dex_tts_tpu.audio.wav import peak_normalize, resample, trim_silence, write_wav, read_wav
from dex_tts_tpu.models.dit import DiTConfig
from dex_tts_tpu.models.edm import SamplerConfig
from dex_tts_tpu.models.tts import GeDEXTTS
from dex_tts_tpu.models.vocoder import HiFiGANConfig, HiFiGANGenerator
from dex_tts_tpu.pipeline import Synthesizer

TINY_DIT = DiTConfig(
    patch_size=3, stride_size=2, hidden_size=32, depth=1, num_heads=2,
    mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2,
)

TINY_VOC = HiFiGANConfig(
    num_mels=16,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=16,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),),
)


@pytest.fixture(scope="module")
def synthesizer():
    model = GeDEXTTS(
        n_vocab=149, n_feats=16, enc_channels=24, enc_filter_channels=32,
        enc_filter_channels_dp=16, enc_heads=2, enc_layers=2, dec_dim=8,
        dec_dim_mults=(1, 2), dit=TINY_DIT,
    )
    import jax.numpy as jnp

    x = jnp.ones((1, 8), jnp.int32)
    xl = jnp.full((1,), 8, jnp.int32)
    y = jnp.zeros((1, 16, 16))
    yl = jnp.full((1,), 16, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jax.random.PRNGKey(2), x, xl, y, yl, train=False,
        method=GeDEXTTS.compute_loss,
    )
    voc = HiFiGANGenerator(TINY_VOC)
    voc_params = voc.init(jax.random.PRNGKey(3), y)["params"]
    return Synthesizer(
        model, variables, vocoder=voc, vocoder_params=voc_params,
        sampler=SamplerConfig(num_steps=2), x_quantum=8, y_quantum=16,
    )


def test_tts_end_to_end(synthesizer):
    out = synthesizer.tts(["hello there", "ok"], key=jax.random.PRNGKey(0))
    assert len(out) == 2
    for item in out:
        assert item["mel"].shape[0] == 16
        assert item["mel"].shape[1] == item["n_frames"]
        assert item["wav"].shape == (item["n_frames"] * 8,)  # tiny voc: 4·2
        assert np.isfinite(item["wav"]).all()


def test_tts_bucket_reuse(synthesizer):
    synthesizer.tts(["first call"], key=jax.random.PRNGKey(1))
    n_graphs = len(synthesizer._synth_cache)
    synthesizer.tts(["first call"], key=jax.random.PRNGKey(2))
    # same text/frame bucket → no new compiled graph
    assert len(synthesizer._synth_cache) == n_graphs


def test_scalar_knobs_do_not_retrace(synthesizer):
    """temperature/length_scale are traced arguments: sweeping them must
    reuse the compiled bucket graph (they were static once — every new
    value recompiled the fused sampler graph)."""
    synthesizer.tts(["knob sweep"], key=jax.random.PRNGKey(1),
                    temperature=1.5)
    run = next(iter(synthesizer._synth_cache.values()))
    traces0 = run._cache_size()
    synthesizer.tts(["knob sweep"], key=jax.random.PRNGKey(1),
                    temperature=1.3, length_scale=1.1)
    assert run._cache_size() == traces0


def test_n_timesteps_cache_keyed_not_cleared(synthesizer):
    """Alternating step counts keeps both compiled graphs cached."""
    synthesizer.tts(["step count a"], key=jax.random.PRNGKey(1),
                    n_timesteps=2)
    synthesizer.tts(["step count a"], key=jax.random.PRNGKey(1),
                    n_timesteps=3)
    keys = set(synthesizer._synth_cache)
    assert {k[3].num_steps for k in keys} >= {2, 3}
    n = len(keys)
    synthesizer.tts(["step count a"], key=jax.random.PRNGKey(1),
                    n_timesteps=2)
    assert len(synthesizer._synth_cache) == n


def test_vocoder_weight_swap_takes_effect(synthesizer):
    """Vocoder params are a jit argument — swapping them must change the
    output of already-compiled bucket graphs."""
    out1 = synthesizer.tts(["swap weights"], key=jax.random.PRNGKey(5))[0]
    orig = synthesizer.vocoder_params
    try:
        synthesizer.vocoder_params = jax.tree.map(
            lambda p: p * 0.0, orig
        )
        out2 = synthesizer.tts(["swap weights"], key=jax.random.PRNGKey(5))[0]
    finally:
        synthesizer.vocoder_params = orig
    np.testing.assert_array_equal(out1["mel"], out2["mel"])
    assert np.abs(out2["wav"]).max() < np.abs(out1["wav"]).max()


def test_ref_feats_mel_lf0_length_mismatch():
    """Pre-extracted (mel, lf0) pairs with unequal lengths are truncated
    to the common length instead of crashing / counting padded frames."""
    from dex_tts_tpu.models.tts import DeXTTS

    model = DeXTTS(
        n_vocab=149, n_feats=16, enc_channels=24, enc_filter_channels=32,
        enc_filter_channels_dp=16, enc_heads=2, enc_layers=1, dec_dim=8,
        dec_dim_mults=(1, 2), dit=TINY_DIT,
        tv_c_h=12, tv_c_out=24, tv_c_out_g=24, tv_layers=1, tv_n_emb=8,
        lf0_c_h=12, lf0_c_out=24, lf0_c_out_g=24, lf0_layers=1,
        tiv_c_h=16, tiv_c_out=8, tiv_layers=1,
    )
    import jax.numpy as jnp

    x = jnp.ones((1, 8), jnp.int32)
    xl = jnp.full((1,), 8, jnp.int32)
    y = jnp.zeros((1, 16, 16))
    yl = jnp.full((1,), 16, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jax.random.PRNGKey(2), x, xl, y, yl,
        ref=y, ref_lengths=yl, sty=y, sty_lengths=yl,
        lf0=jnp.zeros((1, 16)), lf0_lengths=yl,
        train=False, method=DeXTTS.compute_loss,
    )
    synth = Synthesizer(
        model, variables, sampler=SamplerConfig(num_steps=2),
        x_quantum=8, y_quantum=16,
    )
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((16, 20)).astype(np.float32)
    lf0_long = rng.standard_normal((33,)).astype(np.float32)  # > mel T
    out = synth.tts(["mismatch"], key=jax.random.PRNGKey(0),
                    ref_feats=[(mel, lf0_long)], vocode=False)
    assert out[0]["mel"].shape[0] == 16
    lf0_short = rng.standard_normal((7,)).astype(np.float32)  # < mel T
    out = synth.tts(["mismatch"], key=jax.random.PRNGKey(0),
                    ref_feats=[(mel, lf0_short)], vocode=False)
    assert np.isfinite(out[0]["mel"]).all()


def test_wav_roundtrip(tmp_path):
    sr = 22050
    t = np.arange(sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, wav, sr)
    loaded, sr2 = read_wav(path)
    assert sr2 == sr
    np.testing.assert_allclose(loaded, wav, atol=1e-3)


def test_trim_resample_normalize():
    sr = 16000
    sig = np.concatenate(
        [np.zeros(4000), 0.4 * np.sin(2 * np.pi * 220 * np.arange(8000) / sr),
         np.zeros(4000)]
    ).astype(np.float32)
    trimmed = trim_silence(sig, top_db=30)
    assert len(trimmed) < len(sig)
    assert np.abs(trimmed).max() > 0.3
    res = resample(trimmed, sr, 22050)
    assert abs(len(res) / len(trimmed) - 22050 / sr) < 0.01
    assert np.isclose(np.abs(peak_normalize(res)).max(), 1.0, atol=1e-5)


def test_f0_on_known_tone():
    sr, hop = 22050, 256
    t = np.arange(sr) / sr
    wav = (0.6 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    f0 = extract_f0(wav, sr, hop)
    voiced = f0 > 0
    assert voiced.mean() > 0.8
    assert abs(np.median(f0[voiced]) - 220.0) < 5.0
    # silence → unvoiced
    f0_silence = extract_f0(np.zeros(sr, np.float32), sr, hop)
    assert (f0_silence == 0).all()
    lf0 = extract_lf0(wav, sr, hop)
    assert abs(np.exp(np.median(lf0[lf0 != 0])) - 220.0) < 5.0


def test_tts_data_parallel_mesh_matches_single(synthesizer):
    """Serving DP: a Synthesizer with a dp mesh produces the same wavs as
    the single-device one (weights replicated, batch sharded over 'dp')."""
    from dex_tts_tpu.parallel import make_mesh

    texts = ["one", "two", "three", "four"]  # batch 4 over dp=4
    base = synthesizer.tts(texts, key=jax.random.PRNGKey(5))

    dp = Synthesizer(
        synthesizer.model, synthesizer.variables,
        vocoder=synthesizer.vocoder,
        vocoder_params=synthesizer.vocoder_params,
        sampler=SamplerConfig(num_steps=2), x_quantum=8, y_quantum=16,
        mesh=make_mesh(4),
    )
    got = dp.tts(texts, key=jax.random.PRNGKey(5))
    assert len(got) == len(base)
    for a, b in zip(got, base):
        assert a["n_frames"] == b["n_frames"]
        np.testing.assert_allclose(a["mel"], b["mel"], atol=2e-5)


def test_tts_tensor_parallel_mesh_matches_single(synthesizer):
    """Serving TP: dp2 x tp2 mesh tensor-parallel-shards the RetNet/DiT
    matmul params (parallel/tp.py via set_variables) and must reproduce the
    single-device wavs."""
    from jax.sharding import PartitionSpec as P

    from dex_tts_tpu.parallel import make_mesh

    texts = ["one", "two", "three", "four"]  # batch 4 over dp=2
    base = synthesizer.tts(texts, key=jax.random.PRNGKey(5))

    tp = Synthesizer(
        synthesizer.model, synthesizer.variables,
        vocoder=synthesizer.vocoder,
        vocoder_params=synthesizer.vocoder_params,
        sampler=SamplerConfig(num_steps=2), x_quantum=8, y_quantum=16,
        mesh=make_mesh(4, tp_size=2),
    )
    fc1 = tp.variables["params"]["encoder"]["encoder"]["layer_0"]["ffn"][
        "fc1"
    ]["kernel"]
    assert fc1.sharding.spec == P(None, "tp")  # actually split
    got = tp.tts(texts, key=jax.random.PRNGKey(5))
    assert len(got) == len(base)
    for a, b in zip(got, base):
        assert a["n_frames"] == b["n_frames"]
        np.testing.assert_allclose(a["mel"], b["mel"], atol=2e-5)


def test_tts_dit_cache_interval_knob(synthesizer):
    """Turbo sampling through the pipeline: dit_cache_interval joins the
    sampler (and therefore the graph-cache key) and produces finite audio.
    The override is per-call — one turbo request must not silently change
    the fidelity of later calls on a shared Synthesizer."""
    before = synthesizer.sampler
    out = synthesizer.tts(
        ["turbo knob"], key=jax.random.PRNGKey(3), n_timesteps=4,
        dit_cache_interval=2,
    )
    assert np.isfinite(out[0]["wav"]).all()
    assert synthesizer.sampler == before  # restored, not sticky
    out = synthesizer.tts(["turbo knob"], key=jax.random.PRNGKey(3),
                          n_timesteps=4)
    assert np.isfinite(out[0]["wav"]).all()
    assert synthesizer.sampler == before


def test_tts_solver_knob(synthesizer):
    """The per-call solver override (e.g. dpmpp2m for few-step serving)
    produces finite audio, actually changes the sampler output vs euler at
    the same step count, and is not sticky on the shared Synthesizer."""
    before = synthesizer.sampler
    dp = synthesizer.tts(
        ["solver knob"], key=jax.random.PRNGKey(5), n_timesteps=4,
        solver="dpmpp2m",
    )
    assert np.isfinite(dp[0]["wav"]).all()
    assert synthesizer.sampler == before  # restored, not sticky
    eu = synthesizer.tts(["solver knob"], key=jax.random.PRNGKey(5),
                         n_timesteps=4)
    # same RNG, different integrator → different mels (2M extrapolation
    # kicks in from step 2 of 4)
    assert not np.allclose(dp[0]["mel"], eu[0]["mel"])


def test_tts_batch_size_bucketing(synthesizer):
    """Batch sizes pad up to powers of two (repeating the last row) so a
    micro-batching server compiles O(log max_batch) programs per bucket
    pair instead of one per distinct collected size; results keep exactly
    the requested count."""
    seen = []
    orig = synthesizer._place

    def spy(inputs):
        seen.append(int(next(iter(inputs.values())).shape[0]))
        return orig(inputs)

    synthesizer._place = spy
    try:
        out = synthesizer.tts(
            ["pad one", "pad two", "pad three"], key=jax.random.PRNGKey(5)
        )
    finally:
        synthesizer._place = orig
    assert seen == [4]  # 3 → next pow2
    assert len(out) == 3
    for item in out:
        assert np.isfinite(item["wav"]).all()

    # opt-out keeps the exact size
    seen2 = []
    synthesizer._place = lambda inputs: (
        seen2.append(int(next(iter(inputs.values())).shape[0])) or orig(inputs)
    )
    synthesizer.pad_batches = False
    try:
        out = synthesizer.tts(
            ["a", "bb", "ccc"], key=jax.random.PRNGKey(6)
        )
    finally:
        synthesizer._place = orig
        synthesizer.pad_batches = True
    assert seen2 == [3]
    assert len(out) == 3


def test_split_sentences():
    from dex_tts_tpu.pipeline import split_sentences

    assert split_sentences("One. Two! Three?") == ["One.", "Two!", "Three?"]
    # ellipses stay one chunk; decimals and abbreviations never split
    assert split_sentences("Wait... what?") == ["Wait...", "what?"]
    assert split_sentences("Pi is 3.14. Nice.") == ["Pi is 3.14.", "Nice."]
    # punctuation-only fragments are dropped
    assert split_sentences("!? . Hello.") == ["Hello."]
    # long sentence splits near the midpoint comma, recursively;
    # nothing is lost or duplicated
    long = ("alpha " * 40 + ", " + "beta " * 40).strip() + "."
    parts = split_sentences(long, max_chars=120)
    assert all(len(p) <= 120 for p in parts)
    assert "".join(p.replace(" ", "") for p in parts) == long.replace(" ", "")
    assert split_sentences("   ") == []
    # an unbreakable token longer than max_chars survives as-is
    assert split_sentences("x" * 50, max_chars=10) == ["x" * 50]


def test_tts_long_concatenates_with_pauses(synthesizer):
    out = synthesizer.tts_long(
        "Hello there. Nice day!", key=jax.random.PRNGKey(7), pause_ms=100.0
    )
    assert len(out["sentences"]) == 2
    w0 = out["sentences"][0]["wav"]
    w1 = out["sentences"][1]["wav"]
    gap = int(22050 * 0.1)
    assert out["wav"].shape == (len(w0) + gap + len(w1),)
    # the gap is silent
    np.testing.assert_array_equal(out["wav"][len(w0):len(w0) + gap], 0.0)
    assert np.isfinite(out["wav"]).all()


def test_tts_long_chunks_to_max_batch(synthesizer):
    """An article longer than max_batch sentences synthesizes in bounded
    batches (compiled-program set stays bounded) and still returns every
    sentence in order."""
    text = " ".join(f"Sentence number {i} here." for i in range(5))
    calls = []
    orig = synthesizer.tts

    def spy(texts, **kw):
        calls.append(len(texts))
        return orig(texts, **kw)

    synthesizer.tts = spy
    try:
        out = synthesizer.tts_long(
            text, key=jax.random.PRNGKey(8), max_batch=2, pause_ms=50.0
        )
    finally:
        synthesizer.tts = orig
    assert calls == [2, 2, 1]
    assert len(out["sentences"]) == 5
    assert np.isfinite(out["wav"]).all()


def test_tts_stream_ramps_batches_and_orders_sentences(synthesizer):
    """Streaming synthesis: batch sizes ramp first_batch -> 2x -> ... ->
    max_batch (fast first audio), sentences come back in order with
    index/text attached, and with the ramp disabled the outputs are
    bitwise those of tts_long (same key -> same RNG split sequence)."""
    text = " ".join(f"Sentence number {i} here." for i in range(5))
    calls = []
    orig = synthesizer.tts

    def spy(texts, **kw):
        calls.append(len(texts))
        return orig(texts, **kw)

    synthesizer.tts = spy
    try:
        outs = list(
            synthesizer.tts_stream(
                text, key=jax.random.PRNGKey(9), max_batch=2
            )
        )
    finally:
        synthesizer.tts = orig
    assert calls == [1, 2, 2]  # ramp 1 -> 2 -> 2
    assert [o["index"] for o in outs] == list(range(5))
    assert all(o["text"].startswith("Sentence number") for o in outs)
    assert all(np.isfinite(o["wav"]).all() for o in outs)

    # ramp off == tts_long's batching: identical waveforms per sentence
    streamed = list(
        synthesizer.tts_stream(
            text, key=jax.random.PRNGKey(8), max_batch=2, first_batch=2
        )
    )
    long_out = synthesizer.tts_long(
        text, key=jax.random.PRNGKey(8), max_batch=2, pause_ms=50.0
    )
    for s, l in zip(streamed, long_out["sentences"]):
        np.testing.assert_array_equal(s["wav"], l["wav"])

    # validation is eager: a bad text raises AT THE CALL, not at the first
    # next() deep inside some consumer's response-writing loop
    with pytest.raises(ValueError, match="no synthesizable text"):
        synthesizer.tts_stream("   ")
