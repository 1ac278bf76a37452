"""TTS serving daemon: micro-batching HTTP server over the Synthesizer.

The reference stops at a one-shot CLI (DEX-TTS/synthesize.py); serving on
TPU wants concurrent requests coalesced into one compiled-graph dispatch
(see dex_tts_tpu/serving.py). Endpoints:

  POST /tts      {"texts": ["Hello there.", ...]}
                 → {"wavs": [<b64 int16 PCM>], "sample_rate": 22050, "rtf": ...}
  GET  /healthz  → {"ok": true, "batch_sizes": [...], ...}

  python serve.py --config dex_tts_tpu/config/presets/vctk.yaml \
      --weight_path checkpoints/VCTK-0 --ref_name ref.wav --port 8901
"""

from __future__ import annotations

import argparse
import signal
import threading

import jax

from dex_tts_tpu.eval.evaluation import load_synthesizer
from dex_tts_tpu.serving import MicroBatcher, make_server
from dex_tts_tpu.utils import Config, seed_init


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--weight_path", required=True,
                   help="experiment dir with ckpt/")
    p.add_argument("--ref_name", default=None,
                   help="default reference wav (DEX style source)")
    p.add_argument("--spk_id", type=int, default=None, help="GeDEX speaker")
    p.add_argument("--n_timesteps", type=int, default=50)
    p.add_argument("--dit_cache_interval", type=int, default=1,
                   help="approximate turbo sampling: reuse the DiT "
                        "mid-block for k-1 of every k steps (1 = exact)")
    p.add_argument("--solver", default="euler",
                   choices=["euler", "heun", "dpmpp2m"],
                   help="ODE solver; dpmpp2m (DPM-Solver++ 2M, 2nd-order "
                        "multistep) reaches the 50-step euler solution "
                        "with ~16-25 steps")
    p.add_argument("--temperature", type=float, default=1.5)
    p.add_argument("--length_scale", type=float, default=1.0,
                   help="duration multiplier (speech-rate control; "
                        "a traced scalar — no recompilation)")
    p.add_argument("--checkpoint_tag", default="best-train")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8901)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--max_wait_ms", type=float, default=25.0)
    p.add_argument("--split_length_ratio", type=float, default=2.0,
                   help="split a collected batch at the largest text-"
                        "length gap when max/min exceeds this ratio "
                        "(padding waste control; 0 disables)")
    p.add_argument("--max_queue", type=int, default=None,
                   help="admission-queue bound: beyond this many pending "
                        "sentences new requests are fast-rejected with "
                        "503 + Retry-After (default 8*max_batch; 0 "
                        "disables backpressure)")
    p.add_argument("--warmup", default="Warm up the compiled buckets.",
                   help="sentence synthesized once at startup ('' skips)")
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--compile_cache", default=None, metavar="DIR",
                   help="persistent XLA compile cache: restart skips the "
                        "~1-3 min first-compile of each bucket (TPU only)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX backend (e.g. cpu for a smoke "
                        "deployment); note some TPU plugins ignore the "
                        "JAX_PLATFORMS env var, this flag does not")
    args = p.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg = Config(args.config)
    seed_init(args.seed)
    if args.compile_cache:
        if args.platform == "cpu" or jax.default_backend() == "cpu":
            # stale CPU AOT cache entries SIGILL on reload (see CLAUDE.md) —
            # the persistent cache is a TPU-only optimization
            print("--compile_cache ignored on the cpu backend", flush=True)
        else:
            from dex_tts_tpu.utils.compile_cache import enable_compile_cache

            enable_compile_cache(args.compile_cache)
    synth, _ = load_synthesizer(
        cfg, args.weight_path, n_timesteps=args.n_timesteps,
        dit_cache_interval=args.dit_cache_interval, solver=args.solver,
        tag=args.checkpoint_tag,
    )

    key_holder = [jax.random.PRNGKey(args.seed)]
    # fixed reference: preprocess once at startup (trim/resample/mel/lf0),
    # not per sentence per request in the serving hot path
    ref_feats = (
        synth.prepare_reference(args.ref_name) if args.ref_name else None
    )

    def infer(texts):
        key_holder[0], sub = jax.random.split(key_holder[0])
        kw = {}
        if ref_feats is not None:
            kw["ref_feats"] = [ref_feats] * len(texts)
        if args.spk_id is not None:
            kw["spk_ids"] = [args.spk_id] * len(texts)
        return synth.tts(
            texts, key=sub, temperature=args.temperature,
            length_scale=args.length_scale, **kw
        )

    if args.warmup:
        # warm at max_batch: with batch-size bucketing (pipeline.py) this
        # compiles the steady-state program; smaller pow2 sizes compile
        # lazily on light traffic
        print("warmup synthesis ...", flush=True)
        infer([args.warmup] * max(1, args.max_batch))

    batcher = MicroBatcher(
        infer, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        split_length_ratio=args.split_length_ratio,
        max_queue=args.max_queue,
    )
    srv = make_server(
        batcher,
        host=args.host,
        port=args.port,
        sample_rate=int(cfg.preprocess.get("sample_rate", 22050)),
        info={"backend": jax.default_backend(),
              "n_timesteps": args.n_timesteps,
              "solver": args.solver},
    )
    print(f"serving on http://{args.host}:{args.port} "
          f"(max_batch {args.max_batch}, max_wait {args.max_wait_ms} ms)",
          flush=True)

    # SIGTERM (pod maintenance / rolling deploy) → stop accepting, finish
    # the in-flight batch, fail queued requests fast, exit 0.
    # srv.shutdown() blocks until serve_forever acknowledges, so it must
    # run off the main thread (the handler interrupts serve_forever).
    def _graceful(signum, frame):
        print("SIGTERM: shutting down after in-flight batch", flush=True)
        threading.Thread(target=srv.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _graceful)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.close()
        srv.server_close()


if __name__ == "__main__":
    main()
