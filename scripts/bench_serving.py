"""Serving load benchmark: real HTTP server + MicroBatcher + full-size
GeDEX-TTS on the live backend.

Measures what a deployment cares about and `/healthz` alone can't show:
sustained sentences/s under concurrent clients (micro-batching working),
per-request p50/p95 wall-clock, overload behavior (503 + Retry-After
from the bounded admission queue, zero dangling futures), and — with
``--ttfa`` — `/tts_stream` time-to-first-audio (latency of the first
NDJSON pcm line, the ramped-wave path's whole reason to exist) at 1/8/16
concurrent streams.

Run on the TPU host (~5 min incl. the one-off bucket compile):
    python scripts/bench_serving.py [n_clients] [reqs_per_client]
        [--solver euler|dpmpp2m] [--steps N]
        [--vocoder hifigan|bigvgan] [--vocoder_dtype auto|float32|bfloat16]
        [--ttfa]

VERDICT r4 item 4 asked for exactly the recommended-config receipt:
    python scripts/bench_serving.py 16 3 --solver dpmpp2m --steps 16 --ttfa

Prints one JSON line at the end:
  {"metric": "serving throughput ...", "sentences_per_s", "audio_s_per_s",
   "p50_ms", "p95_ms", "overload_rejects", "ttfa": {...}, ...}

reference: the reference repo has no serving story at all (synthesize.py
is batch-offline; DEX-TTS/synthesize.py:90-130) — this benchmarks the
framework-added daemon (dex_tts_tpu/serving.py).
"""

import argparse
import http.client
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from __graft_entry__ import _full_size_gedex
from dex_tts_tpu.models.edm import SamplerConfig
from dex_tts_tpu.models.tts import GeDEXTTS
from dex_tts_tpu.models.vocoder import HiFiGANConfig, HiFiGANGenerator
from dex_tts_tpu.pipeline import Synthesizer
from dex_tts_tpu.serving import MicroBatcher, make_server

PORT = 8917
SR = 22050

# one x-bucket worth of sentence variety (lengths differ, same compiled
# program); random-init weights — wall-clock is weight-independent
SENTENCES = [
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "A serving benchmark measures batching, not just single calls.",
    "Speech synthesis on accelerators rewards large fused batches.",
    "Latency percentiles reveal what averages politely hide away.",
]


SMOKE = os.environ.get("BENCH_SERVING_SMOKE") == "1"  # tiny model, CPU
if SMOKE:
    # the axon TPU plugin ignores JAX_PLATFORMS (CLAUDE.md); force here,
    # before any backend use
    jax.config.update("jax_platforms", "cpu")


def build_synth(args) -> Synthesizer:
    if SMOKE:
        from dex_tts_tpu.models.dit import DiTConfig

        model = GeDEXTTS(
            n_vocab=149, n_feats=80, enc_channels=24,
            enc_filter_channels=32, enc_filter_channels_dp=16,
            enc_heads=2, enc_layers=1, dec_dim=8, dec_dim_mults=(1, 2),
            dit=DiTConfig(patch_size=3, stride_size=2, hidden_size=32,
                          depth=1, num_heads=2, mlp_ratio=2.0,
                          conv_pos=4, conv_pos_groups=2),
        )
    else:
        model = _full_size_gedex()
    import jax.numpy as jnp

    x = jnp.ones((1, 8), jnp.int32)
    xl = jnp.full((1,), 8, jnp.int32)
    y = jnp.zeros((1, 80, 64))
    yl = jnp.full((1,), 64, jnp.int32)

    @jax.jit
    def _init():
        return model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jax.random.PRNGKey(2), x, xl, y, yl, train=False,
            method=GeDEXTTS.compute_loss,
        )

    variables = _init()
    voc_dtype = args.vocoder_dtype
    if voc_dtype == "auto":
        voc_dtype = "bfloat16" if args.vocoder == "bigvgan" else "float32"
    if SMOKE:
        voc = HiFiGANGenerator(HiFiGANConfig(
            num_mels=80, upsample_rates=(4, 2),
            upsample_kernel_sizes=(8, 4), upsample_initial_channel=16,
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
        ))
    elif args.vocoder == "bigvgan":
        from dex_tts_tpu.models.vocoder import BigVGANConfig, BigVGANGenerator

        voc = BigVGANGenerator(BigVGANConfig(num_mels=80, dtype=voc_dtype))
    else:
        voc = HiFiGANGenerator(HiFiGANConfig(num_mels=80, dtype=voc_dtype))
    voc_params = jax.jit(voc.init)(jax.random.PRNGKey(3), y)["params"]
    cmu = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "resources", "cmu_dictionary",
    )
    return Synthesizer(
        model, variables, vocoder=voc, vocoder_params=voc_params,
        cmu_path=cmu if os.path.exists(cmu) else None,
        sampler=SamplerConfig(
            num_steps=2 if SMOKE else args.steps, solver=args.solver
        ),
    )


def post(path: str, payload: dict, timeout: float = 300.0):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    t0 = time.time()
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            body = json.loads(r.read())
            return r.status, body, time.time() - t0
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}"), time.time() - t0
    except (urllib.error.URLError, ConnectionError, OSError):
        # kernel-level connection reset: the TCP accept backlog overflowed
        # before the HTTP layer could 503 — still an overload signal
        return 599, {}, time.time() - t0


def stream_request(paragraph: str, timeout: float = 600.0) -> dict:
    """POST /tts_stream and read the chunked NDJSON response line by
    line. Returns {"ttfa": s-to-first-pcm-line, "wall": total s,
    "lines": n_pcm_lines, "error": ...}. http.client decodes the chunked
    framing, so readline() returns as soon as a line's chunks arrive —
    exactly what a playback client would see."""
    conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=timeout)
    body = json.dumps({"text": paragraph, "pause_ms": 120}).encode()
    t0 = time.monotonic()
    out = {"ttfa": None, "wall": None, "lines": 0, "error": None}
    try:
        conn.request(
            "POST", "/tts_stream", body,
            {"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        if resp.status != 200:
            out["error"] = resp.status
            resp.read()
            return out
        while True:
            line = resp.readline()
            if not line:
                break
            rec = json.loads(line)
            if "pcm" in rec:
                if out["ttfa"] is None:
                    out["ttfa"] = time.monotonic() - t0
                out["lines"] += 1
            elif "error" in rec:
                out["error"] = rec["error"]
        out["wall"] = time.monotonic() - t0
    except (OSError, http.client.HTTPException) as e:
        out["error"] = repr(e)
    finally:
        conn.close()
    return out


def ttfa_phase(paragraph: str, concurrencies=(1, 8, 16)) -> dict:
    """Time-to-first-audio for /tts_stream under concurrent streams."""
    results = {}
    for conc in concurrencies:
        recs: list[dict] = []
        lock = threading.Lock()

        def one():
            r = stream_request(paragraph)
            with lock:
                recs.append(r)

        threads = [threading.Thread(target=one) for _ in range(conc)]
        t0 = time.monotonic()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.monotonic() - t0
        ok = [r for r in recs if r["error"] is None and r["ttfa"] is not None]
        ttfas = sorted(r["ttfa"] for r in ok)
        walls = sorted(r["wall"] for r in ok)

        def pct(vals, q):
            return vals[min(len(vals) - 1, int(q * len(vals)))] * 1e3

        results[str(conc)] = {
            "ok": len(ok),
            "errors": [r["error"] for r in recs if r["error"] is not None],
            "ttfa_p50_ms": round(pct(ttfas, 0.50), 1) if ttfas else None,
            "ttfa_p95_ms": round(pct(ttfas, 0.95), 1) if ttfas else None,
            "stream_p50_ms": round(pct(walls, 0.50), 1) if walls else None,
            "stream_p95_ms": round(pct(walls, 0.95), 1) if walls else None,
            "phase_wall_s": round(wall, 1),
        }
        print(f"ttfa conc={conc}: {results[str(conc)]}", flush=True)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("n_clients", nargs="?", type=int, default=16)
    p.add_argument("per_client", nargs="?", type=int, default=3)
    p.add_argument("--solver", default="euler",
                   choices=["euler", "heun", "dpmpp2m"])
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--vocoder", default="hifigan",
                   choices=["hifigan", "bigvgan"])
    p.add_argument("--vocoder_dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"])
    p.add_argument("--ttfa", action="store_true",
                   help="measure /tts_stream time-to-first-audio at "
                        "1/8/16 concurrent streams")
    args = p.parse_args()
    n_clients, per_client = args.n_clients, args.per_client

    synth = build_synth(args)
    key_holder = [jax.random.PRNGKey(7)]
    lock = threading.Lock()

    def infer(texts):
        with lock:
            key_holder[0], sub = jax.random.split(key_holder[0])
        return synth.tts(texts, key=sub, spk_ids=[0] * len(texts))

    max_batch = 16
    batcher = MicroBatcher(infer, max_batch=max_batch, max_wait_ms=25.0)
    srv = make_server(batcher, port=PORT, sample_rate=SR,
                      info={"bench": True})
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()

    # warmup: compile EVERY pow2 batch bucket the collector can form —
    # the first TPU run showed a single missed bucket costs a ~70-150 s
    # mid-flight compile that destroys the percentile story (p95 146 s).
    # Warm through the Synthesizer directly, NOT over HTTP: when the
    # remote compile service degrades (~200 s+ per graph, CLAUDE.md) an
    # HTTP warmup exceeds any sane client timeout and 599s out. One
    # fixed sentence keeps the x/y buckets constant so the compiled-
    # program set is exactly these five.
    print("warmup (pow2 batch-bucket compiles) ...", flush=True)
    t0 = time.time()
    bs = 1
    while bs <= max_batch:
        tb = time.time()
        infer([SENTENCES[0]] * bs)
        print(f"  batch {bs}: {time.time()-tb:.0f}s", flush=True)
        bs *= 2
    print(f"warmup done in {time.time()-t0:.0f}s", flush=True)
    # one HTTP round-trip to confirm the server path itself is live
    st, _, _ = post("/tts", {"texts": [SENTENCES[0]]}, timeout=600.0)
    assert st == 200, st

    # --- load phase: n_clients concurrent, per_client sequential each ---
    lat, audio_s, errs = [], [], []

    def client(i):
        for j in range(per_client):
            # fixed sentence: measures steady-state batching, not compiles
            text = SENTENCES[0]
            st, body, wall = post("/tts", {"texts": [text]})
            if st != 200:
                errs.append(st)
                continue
            lat.append(wall)
            audio_s.append(float(body["audio_seconds"]))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    t0 = time.time()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.time() - t0
    n_ok = len(lat)
    lat_s = sorted(lat)

    def pct(q):
        return lat_s[min(len(lat_s) - 1, int(q * len(lat_s)))] * 1e3

    # --- TTFA phase: /tts_stream first-audio latency (before the
    # overload phase shrinks the queue) ---
    ttfa = None
    if args.ttfa:
        paragraph = " ".join(SENTENCES + SENTENCES[:2])  # 6 sentences
        ttfa = ttfa_phase(paragraph)

    # --- overload phase: shrink the queue, hammer, expect 503s ---
    batcher.max_queue = 4
    codes = []

    def hammer(i):
        st, body, _ = post("/tts", {"texts": [SENTENCES[0]]})
        codes.append(st)

    hthreads = [threading.Thread(target=hammer, args=(i,))
                for i in range(3 * max_batch)]
    for th in hthreads:
        th.start()
    for th in hthreads:
        th.join()
    rejects = sum(1 for c in codes if c == 503)
    served = sum(1 for c in codes if c == 200)
    resets = sum(1 for c in codes if c == 599)

    # health snapshot (queue drained, futures resolved)
    with urllib.request.urlopen(
        f"http://127.0.0.1:{PORT}/healthz", timeout=30
    ) as r:
        health = json.loads(r.read())

    batcher.close()
    srv.shutdown()

    print(json.dumps({
        "metric": "serving throughput, GeDEX-TTS full scale + "
                  f"{args.vocoder} ({args.steps}-step {args.solver}, "
                  f"micro-batch<=16, {n_clients} concurrent clients)",
        "solver": args.solver,
        "steps": args.steps,
        "vocoder": args.vocoder,
        "vocoder_dtype": args.vocoder_dtype,
        "ttfa": ttfa,
        "sentences_per_s": round(n_ok / wall, 3),
        "audio_s_per_s": round(sum(audio_s) / wall, 2),
        "serving_rtf": round(wall / max(sum(audio_s), 1e-9), 5),
        "n_ok": n_ok,
        "errors": errs,
        "p50_ms": round(pct(0.50), 1),
        "p95_ms": round(pct(0.95), 1),
        "overload_rejects_503": rejects,
        "overload_served_200": served,
        "overload_tcp_resets": resets,
        "queue_depth_after": health.get("queue_depth"),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
