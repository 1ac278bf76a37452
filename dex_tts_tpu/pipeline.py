"""End-to-end inference engine: text (+ reference speech / speaker id) →
waveform.

Public equivalent of the reference's synthesize.py flow
(reference: DEX-TTS/synthesize.py:64-113, GeDEX-TTS/synthesize.py:32-73),
re-designed for XLA's static shapes:

  1. a small jitted `encode` pass predicts durations,
  2. the host rounds the implied frame count up to a bucket,
  3. one jitted graph per (text-bucket, frame-bucket) runs the full
     text→mel 50-step sampler (and optionally the vocoder fused into the
     same graph — BASELINE config 4).

Compiled graphs are cached per bucket, so steady-state synthesis never
recompiles. Batched inputs saturate the MXU across sentences.
"""

from __future__ import annotations

import re

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.audio.pitch import extract_lf0, normalize_lf0
from dex_tts_tpu.audio.stft import MelSpectrogram
from dex_tts_tpu.audio.wav import peak_normalize, read_wav, resample, trim_silence
from dex_tts_tpu.models.edm import SamplerConfig
from dex_tts_tpu.ops import fix_len_compatibility
from dex_tts_tpu.text import CMUDict, text_to_sequence
from dex_tts_tpu.text.symbols import BLANK_ID
from dex_tts_tpu.utils import intersperse

HOP_LENGTH = 256
SAMPLE_RATE = 22050


def split_sentences(text: str, max_chars: int = 400) -> list[str]:
    """Split a paragraph into sentence-sized chunks for batched synthesis.

    Splits after sentence-final punctuation followed by whitespace (so
    ellipses stay one chunk and decimals like "3.14" never split); chunks
    with no word character are dropped. A chunk still longer than
    ``max_chars`` is further split at the comma or space nearest its
    midpoint, recursively. Never returns empty chunks."""
    out = [
        c.strip()
        for c in re.split(r"(?<=[.!?;])\s+", text.strip())
        if re.search(r"\w", c)
    ]

    def shorten(s: str) -> list[str]:
        if len(s) <= max_chars:
            return [s]
        mid = len(s) // 2
        for sep in (",", " "):
            cands = [i for i, c in enumerate(s) if c == sep and 0 < i < len(s) - 1]
            if cands:
                cut = min(cands, key=lambda i: abs(i - mid)) + 1
                left, right = s[:cut].strip(), s[cut:].strip()
                if left and right:
                    return shorten(left) + shorten(right)
        return [s]  # one unbreakable token — let bucketing cap it

    return [c for s in out for c in shorten(s)]


def _bucket(n: int, quantum: int, minimum: int = 0) -> int:
    return max(minimum, -(-n // quantum) * quantum)


def ramp_spans(
    n: int, max_batch: int, first_batch: int = 1
) -> list[tuple[int, int]]:
    """(lo, hi) spans covering range(n) with sizes ramping
    ``first_batch → 2x → … → max_batch`` — the batching schedule shared by
    `Synthesizer.tts_stream` and the serving daemon's /tts_stream endpoint
    (small first batch for time-to-first-audio, full batches for the tail)."""
    max_batch = max(1, max_batch)
    size = max(1, min(first_batch, max_batch))
    spans, lo = [], 0
    while lo < n:
        hi = min(n, lo + size)
        spans.append((lo, hi))
        lo, size = hi, min(max_batch, size * 2)
    return spans


class Synthesizer:
    def __init__(
        self,
        model,
        variables,
        vocoder=None,
        vocoder_params=None,
        cmu_path: str | None = None,
        add_blank: bool = True,
        sampler: SamplerConfig | None = None,
        x_quantum: int = 32,
        y_quantum: int = 64,
        use_ema: bool = False,
        ema_params=None,
        mesh=None,
        pad_batches: bool = True,
    ):
        """mesh: optional jax.sharding.Mesh — serving-time data parallelism.
        Batch inputs are laid out over the mesh's 'dp' axis (weights
        replicated); each bucket graph then runs sharded across chips with
        no code changes (the dp size must divide the batch size)."""
        if use_ema and ema_params is not None:
            variables = dict(variables)
            variables["params"] = ema_params
        self.model = model
        self.mesh = mesh
        self.set_variables(variables)
        self.vocoder = vocoder
        self.vocoder_params = vocoder_params
        self.cmudict = CMUDict(cmu_path) if cmu_path else None
        self.add_blank = add_blank
        self.sampler = sampler or SamplerConfig(num_steps=50)
        self.x_quantum = x_quantum
        self.y_quantum = y_quantum
        # batch-size bucketing: pad every batch up to a power of two
        # (repeating the last row; extra results are dropped). Like the
        # length buckets, this bounds the set of compiled programs — a
        # micro-batching server otherwise compiles a fresh multi-minute
        # XLA program for every distinct batch size it happens to collect.
        self.pad_batches = pad_batches
        self.mel_extractor = MelSpectrogram()
        self.hop = HOP_LENGTH
        if vocoder is not None and hasattr(vocoder, "cfg"):
            self.hop = int(np.prod(vocoder.cfg.upsample_rates))

        self._encode = jax.jit(self._encode_impl)
        self._synth_cache: dict = {}

    # -- text/feature prep ----------------------------------------------------

    def prepare_text(self, text: str) -> np.ndarray:
        seq = text_to_sequence(text, dictionary=self.cmudict)
        if self.add_blank:
            seq = intersperse(seq, BLANK_ID)
        return np.asarray(seq, np.int32)

    def prepare_reference(self, wav_path: str):
        """Reference wav → (mel (80, T), normalized lf0 (T,)).
        reference: DEX-TTS/synthesize.py:40-62."""
        wav, sr = read_wav(wav_path)
        wav = trim_silence(wav, top_db=30.0)
        wav = resample(wav, sr, SAMPLE_RATE)
        wav = peak_normalize(wav)
        mel, _ = self.mel_extractor(jnp.asarray(wav)[None])
        mel = np.asarray(mel[0])
        lf0 = normalize_lf0(extract_lf0(wav, SAMPLE_RATE, HOP_LENGTH))
        t = min(mel.shape[1], len(lf0))
        return mel[:, :t], lf0[:t]

    # -- jitted stages ---------------------------------------------------------
    # `variables` is a jit *argument* (not a closure constant) so weights can
    # be swapped (e.g. per train epoch) without recompiling any cached graph.

    def set_variables(self, variables) -> None:
        """Swap model weights; compiled bucket graphs are reused.

        With a mesh whose 'tp' axis is >1, the RetNet/DiT matmul params are
        tensor-parallel-sharded over it (parallel/tp.py rules) — XLA SPMD
        splits those matmuls across chips inside every bucket graph;
        everything else replicates."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if self.mesh.shape.get("tp", 1) > 1:
                from dex_tts_tpu.parallel import tp_state_shardings

                variables = jax.device_put(
                    variables, tp_state_shardings(variables, self.mesh)
                )
            else:
                variables = jax.device_put(
                    variables, NamedSharding(self.mesh, P())
                )
        self.variables = variables

    def _place(self, inputs: dict) -> dict:
        """dp-shard the batch inputs over the mesh (no-op without one)."""
        if self.mesh is None:
            return inputs
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = self.mesh.shape["dp"]
        b = next(iter(inputs.values())).shape[0]
        assert b % dp == 0, (
            f"batch size {b} must be a multiple of the mesh's dp size {dp}"
        )
        return {
            k: jax.device_put(
                v, NamedSharding(self.mesh, P("dp", *([None] * (v.ndim - 1))))
            )
            for k, v in inputs.items()
        }

    def _encode_impl(self, variables, x, x_lengths, spk=None, **cond_inputs):
        return self.model.apply(
            variables,
            x,
            x_lengths,
            spk=spk,
            method=type(self.model).predict_durations,
            **cond_inputs,
        )

    def _get_synth(self, x_len: int, y_len: int, with_vocoder: bool,
                   sampler: SamplerConfig):
        # sampler settings are compile-time constants of the scan graph, so
        # they join the cache key (alternating n_timesteps=50/10 then reuses
        # two cached graphs instead of recompiling)
        key = (x_len, y_len, with_vocoder, sampler)
        if key in self._synth_cache:
            return self._synth_cache[key]

        method = type(self.model).synthesize

        @jax.jit
        def run(variables, voc_params, rng, inputs, temperature, length_scale):
            # temperature/length_scale are traced scalars (they only enter
            # noise scaling and duration arithmetic) — sweeping them reuses
            # the compiled graph; voc_params is an argument, not a closure
            # constant, so swapped vocoder weights take effect immediately
            enc, dec, attn, y_lengths = self.model.apply(
                variables,
                rng,
                inputs["x"],
                inputs["x_lengths"],
                y_max_length=y_len,
                sampler=sampler,
                temperature=temperature,
                length_scale=length_scale,
                method=method,
                **{
                    k: v
                    for k, v in inputs.items()
                    if k not in ("x", "x_lengths")
                },
            )
            out = {"mel": dec, "enc": enc, "y_lengths": y_lengths}
            if with_vocoder:
                out["wav"] = self.vocoder.apply({"params": voc_params}, dec)
            return out

        self._synth_cache[key] = run
        return run

    # -- public API ------------------------------------------------------------

    def predict_frames(self, inputs: dict, length_scale=1.0) -> int:
        """Host-side frame estimate from the duration predictor."""
        cond = {k: v for k, v in inputs.items() if k not in ("x", "x_lengths")}
        logw, x_mask = self._encode(
            self.variables, inputs["x"], inputs["x_lengths"], **cond
        )
        w = np.exp(np.asarray(logw[:, :, 0])) * np.asarray(x_mask[:, :, 0])
        frames = np.ceil(w).sum(axis=1) * length_scale
        return int(frames.max())

    def tts(
        self,
        texts: Sequence[str],
        key=None,
        n_timesteps: int | None = None,
        dit_cache_interval: int | None = None,
        solver: str | None = None,
        temperature: float = 1.5,
        length_scale: float = 1.0,
        spk_ids: Sequence[int] | None = None,
        ref_wavs: Sequence[str] | None = None,
        ref_feats: Sequence[tuple] | None = None,
        vocode: bool = True,
        max_frames: int = 2048,
    ) -> list[dict]:
        """Synthesize a batch of sentences → list of {mel, wav, n_frames}."""
        if key is None:
            key = jax.random.PRNGKey(0)
        overrides = {}
        if n_timesteps is not None and n_timesteps != self.sampler.num_steps:
            overrides["num_steps"] = n_timesteps
        if (
            dit_cache_interval is not None
            and dit_cache_interval != self.sampler.dit_cache_interval
        ):
            # approximate turbo mode (models/edm._dit_cache_sampler)
            overrides["dit_cache_interval"] = dit_cache_interval
        if solver is not None and solver != self.sampler.solver:
            # e.g. "dpmpp2m": 2nd-order multistep — ~16-25 steps reach the
            # 50-step euler solution (models/edm._dpmpp2m_sampler)
            overrides["solver"] = solver
        # the override is a per-call local — never written to self, so
        # concurrent tts() calls on a shared Synthesizer each keep their
        # own fidelity (the sampler joins the graph-cache key; graphs for
        # other step counts / cache intervals stay cached)
        sampler = (
            SamplerConfig(**{**self.sampler.__dict__, **overrides})
            if overrides
            else self.sampler
        )
        return self._tts_batch(
            texts, key, temperature, length_scale, spk_ids, ref_wavs,
            ref_feats, vocode, max_frames, sampler,
        )

    def tts_stream(
        self,
        text: str,
        key=None,
        max_chars: int = 400,
        max_batch: int = 16,
        first_batch: int = 1,
        **tts_kwargs,
    ):
        """Incremental long-form synthesis: a generator yielding one
        result dict per sentence, in order, as its batch completes.

        Sentence batches ramp ``first_batch → 2x → … → max_batch``, so the
        first audio is ready after a single small synthesis instead of a
        full-article batch (time-to-first-audio), while the tail still
        rides MXU-saturating batches (throughput). Each yielded dict is a
        `tts` result plus ``index`` (sentence position) and ``text``.

        Per-sentence conditioning (`spk_ids`/`ref_wavs`/`ref_feats`) in
        ``tts_kwargs`` may be a single value — it is broadcast to every
        sentence (a single reference wav is preprocessed once, not per
        sentence).

        Splitting/validation happen eagerly at call time (a bad ``text``
        raises here, not at the first ``next()`` deep inside a consumer
        loop); the returned generator only does synthesis."""
        chunks = split_sentences(text, max_chars=max_chars)
        if not chunks:
            raise ValueError("no synthesizable text")
        n = len(chunks)
        tts_kwargs = dict(tts_kwargs)
        # a single reference wav: trim/resample/mel/lf0 ONCE, then share
        # the prepared features across every sentence
        if tts_kwargs.get("ref_wavs") is not None and len(
            tts_kwargs["ref_wavs"]
        ) == 1:
            tts_kwargs["ref_feats"] = [
                self.prepare_reference(tts_kwargs.pop("ref_wavs")[0])
            ]
        for k in ("spk_ids", "ref_wavs", "ref_feats"):
            v = tts_kwargs.get(k)
            if v is not None and len(v) == 1 and n > 1:
                tts_kwargs[k] = list(v) * n
        if key is None:
            key = jax.random.PRNGKey(0)
        spans = ramp_spans(n, max_batch, first_batch)
        return self._tts_stream_gen(chunks, key, spans, tts_kwargs)

    def _tts_stream_gen(self, chunks, key, spans, tts_kwargs):
        for lo, hi in spans:
            key, sub = jax.random.split(key)
            group_kwargs = dict(tts_kwargs)
            for k in ("spk_ids", "ref_wavs", "ref_feats"):
                if group_kwargs.get(k) is not None:
                    group_kwargs[k] = group_kwargs[k][lo:hi]
            for i, r in enumerate(
                self.tts(chunks[lo:hi], key=sub, **group_kwargs)
            ):
                r = dict(r)
                r["index"] = lo + i
                r["text"] = chunks[lo + i]
                yield r

    def tts_long(
        self,
        text: str,
        key=None,
        pause_ms: float = 200.0,
        max_chars: int = 400,
        max_batch: int = 16,
        **tts_kwargs,
    ) -> dict:
        """Paragraph/article synthesis: split ``text`` into sentences
        (`split_sentences`), synthesize them in batched calls of up to
        ``max_batch`` (they co-bucket and saturate the MXU; the cap keeps
        the compiled-program set and activation footprint bounded for
        arbitrarily long articles), and concatenate the waveforms with
        ``pause_ms`` of silence between sentences.

        Built on `tts_stream` with the ramp disabled (``first_batch =
        max_batch``): offline synthesis wants full batches from the start.
        Returns {"wav", "sentences": [per-sentence dicts]}.
        """
        results = list(
            self.tts_stream(
                text,
                key=key,
                max_chars=max_chars,
                max_batch=max_batch,
                first_batch=max_batch,
                **tts_kwargs,
            )
        )
        if "wav" not in results[0]:
            return {"sentences": results}
        gap = np.zeros(int(SAMPLE_RATE * pause_ms / 1e3), np.float32)
        parts: list[np.ndarray] = []
        for i, r in enumerate(results):
            if i:
                parts.append(gap)
            parts.append(np.asarray(r["wav"], np.float32))
        return {"wav": np.concatenate(parts), "sentences": results}

    def _tts_batch(self, texts, key, temperature, length_scale, spk_ids,
                   ref_wavs, ref_feats, vocode, max_frames, sampler):
        seqs = [self.prepare_text(t) for t in texts]
        b = len(seqs)
        x_max = _bucket(max(len(s) for s in seqs), self.x_quantum)
        x = np.zeros((b, x_max), np.int32)
        x_lengths = np.zeros((b,), np.int32)
        for i, s in enumerate(seqs):
            x[i, : len(s)] = s
            x_lengths[i] = len(s)

        inputs = {"x": jnp.asarray(x), "x_lengths": jnp.asarray(x_lengths)}
        if spk_ids is not None:
            inputs["spk"] = jnp.asarray(np.asarray(spk_ids, np.int32))

        if ref_wavs is not None or ref_feats is not None:
            if ref_wavs is not None:
                mels, lf0s = zip(*[self.prepare_reference(p) for p in ref_wavs])
            else:
                # pre-extracted (mel (F, T), lf0 (T,)) pairs, e.g. dataset
                # features (reference: DEX-TTS/src/evaluation.py uses the
                # dataset's own ref/sty/lf0 for objective eval)
                mels, lf0s = zip(*ref_feats)
            # mel and lf0 can disagree in length for pre-extracted features;
            # truncate each pair to the common length (as prepare_reference
            # does) so lf0_lengths never counts zero-padded frames
            pairs = [
                (m[:, : min(m.shape[1], len(l))], l[: min(m.shape[1], len(l))])
                for m, l in zip(mels, lf0s)
            ]
            t_max = _bucket(
                max(m.shape[1] for m, _ in pairs), self.y_quantum, 4
            )
            ref = np.zeros((b, pairs[0][0].shape[0], t_max), np.float32)
            lf0 = np.zeros((b, t_max), np.float32)
            lens = np.zeros((b,), np.int32)
            for i, (m, l) in enumerate(pairs):
                ref[i, :, : m.shape[1]] = m
                lf0[i, : len(l)] = l
                lens[i] = m.shape[1]
            inputs.update(
                ref=jnp.asarray(ref),
                ref_lengths=jnp.asarray(lens),
                sty=jnp.asarray(ref),
                sty_lengths=jnp.asarray(lens),
                lf0=jnp.asarray(lf0),
                lf0_lengths=jnp.asarray(lens),
            )

        if self.pad_batches:
            b_pad = 1 << (b - 1).bit_length()  # next power of two
            if self.mesh is not None:
                # keep _place's divisibility contract for non-pow2 dp sizes
                dp = self.mesh.shape["dp"]
                b_pad = -(-b_pad // dp) * dp
            if b_pad != b:
                # repeat the last row: padding stays a valid input (masks
                # and duration prediction see a real sentence), and the
                # extra rows are dropped from the results below
                inputs = {
                    k: jnp.concatenate(
                        [v, jnp.repeat(v[-1:], b_pad - b, axis=0)]
                    )
                    for k, v in inputs.items()
                }

        inputs = self._place(inputs)

        # phase 1: duration estimate → frame bucket
        n_frames = self.predict_frames(inputs, length_scale)
        y_len = fix_len_compatibility(
            min(_bucket(n_frames, self.y_quantum, 8), max_frames)
        )

        # phase 2: full synthesis at the bucketed length
        with_voc = vocode and self.vocoder is not None
        run = self._get_synth(x_max, y_len, with_voc, sampler)
        voc_params = self.vocoder_params if with_voc else {}
        out = run(
            self.variables, voc_params, key, inputs,
            jnp.float32(temperature), jnp.float32(length_scale),
        )

        mels = np.asarray(out["mel"])
        lens = np.asarray(out["y_lengths"])
        # one device→host transfer for the whole batch (slicing the device
        # array per item would pay a ~30 ms dispatch round-trip per sentence
        # on a remote-TPU link)
        wavs = np.asarray(out["wav"]) if with_voc else None
        results = []
        for i in range(b):
            # .copy(): the slices are views into the whole (padded) batch
            # transfer — a caller keeping one short sentence must not pin
            # the full batch buffer alive
            item = {
                "mel": mels[i, :, : lens[i]].copy(),
                "n_frames": int(lens[i]),
            }
            if with_voc:
                item["wav"] = wavs[i, : lens[i] * self.hop].copy()
            results.append(item)
        return results
