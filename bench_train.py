"""Training-throughput benchmark: DeX-TTS train step at the ESD config
(BASELINE config 5: emotional-speech training loop) on the available chip(s).

Prints ONE JSON line {"metric", "value", "unit", "steps_per_sec", ...}.
The reference publishes no training wall-clock numbers (BASELINE.md), so the
recorded value is the measured baseline for future rounds.

Run: python bench_train.py [--batch 32] [--frames 256] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from dex_tts_tpu.config import build_model
from dex_tts_tpu.ops import fix_len_compatibility
from dex_tts_tpu.train import create_train_state, make_train_step
from dex_tts_tpu.utils import Config

PRESET = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "dex_tts_tpu", "config", "presets", "esd.yaml",
)


def synthetic_batch(b: int, frames: int, n_feats: int = 80, tx: int = 96):
    """Random batch at the ESD feature shapes (mel/lf0/ref/sty share the
    frame bucket, as BucketBatcher produces)."""
    rng = np.random.default_rng(0)
    lens = np.full((b,), frames, np.int32)
    mel = rng.standard_normal((b, n_feats, frames)).astype(np.float32)
    return {
        "x": rng.integers(1, 148, (b, tx)).astype(np.int32),
        "x_lengths": np.full((b,), tx, np.int32),
        "y": mel,
        "y_lengths": lens,
        "ref": mel,
        "ref_lengths": lens,
        "sty": mel,
        "sty_lengths": lens,
        "lf0": rng.standard_normal((b, frames)).astype(np.float32),
        "lf0_lengths": lens,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="denoiser compute dtype (decoder.compute_dtype)")
    p.add_argument("--attention", default=None,
                   help="DiT attention override (e.g. flash_bf16)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of a few timed "
                        "steps into DIR (analyze with "
                        "scripts/trace_top_ops.py)")
    args = p.parse_args()

    cfg = Config(PRESET)
    cfg.model.decoder.compute_dtype = args.dtype
    if args.attention:
        cfg.model.dit.attention = args.attention
    model = build_model(cfg)
    out_size = fix_len_compatibility(
        int(cfg.train.fix_len * cfg.preprocess.sample_rate
            / cfg.preprocess.hop_length)
    )
    batch = synthetic_batch(args.batch, args.frames)
    state, tx = create_train_state(
        model, batch, lr=float(cfg.train.lr),
        max_grad=float(cfg.train.get("max_grad", 5.0)), out_size=out_size,
    )
    step = jax.jit(
        make_train_step(
            model, tx, out_size=out_size,
            ema_decay=float(cfg.train.get("ema_decay", 0.99999)),
        ),
        donate_argnums=(0,),
    )

    # compile + warmup (materialize a scalar: block_until_ready alone does
    # not wait for remote completion on the axon tunnel)
    state, metrics = step(state, batch)
    float(metrics["total_loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch)
    total = float(metrics["total_loss"])  # sync once at the end
    elapsed = time.perf_counter() - t0

    if args.profile:
        jax.profiler.start_trace(args.profile)
        for _ in range(3):
            state, metrics = step(state, batch)
        float(metrics["total_loss"])
        jax.profiler.stop_trace()

    steps_per_sec = args.steps / elapsed

    # MFU: the train step has no sampler scan (loss at one σ per item), so
    # plain lowered-HLO cost analysis prices fwd+bwd correctly; the only
    # loop is MAS whose flops are negligible (~2 ms of ~200 ms, max/add)
    from dex_tts_tpu.utils.mfu import lowered_flops, mfu, peak_flops_per_chip

    flops_step = lowered_flops(step, state, batch, compile_fallback=True)
    step_mfu = mfu(flops_step, elapsed / args.steps)
    peak = peak_flops_per_chip()
    print(
        json.dumps(
            {
                "metric": (
                    f"DeX-TTS ESD train step throughput (batch {args.batch}, "
                    f"{args.frames}-frame bucket, out_size {out_size})"
                ),
                "value": round(steps_per_sec, 4),
                "unit": "steps/s",
                "items_per_sec": round(steps_per_sec * args.batch, 2),
                "final_loss": round(total, 4),
                "n_devices": jax.device_count(),
                "compute_dtype": args.dtype,
                "tflops_per_step": (
                    round(flops_step / 1e12, 3) if flops_step else None
                ),
                "mfu": round(step_mfu, 4) if step_mfu else None,
                "peak_tflops": round(peak / 1e12, 1) if peak else None,
            }
        )
    )


if __name__ == "__main__":
    main()
