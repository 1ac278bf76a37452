"""Root-cause harness for the batch-128 bench_train loss blow-up
(BENCH_SWEEP round 3: final_loss 85.6 at b128 vs 4.9 at b32/b64 after
20 steps).

Runs the bench_train step (same synthetic_batch, same optimizer wiring)
at a configurable model scale across batch sizes, printing the per-term
losses and grad_norm at every step so the diverging term is visible.

CPU-runnable with --tiny; full ESD scale with --full (slow off-TPU).

Usage: python scripts/debug_b128.py [--batches 32,128] [--steps 21]
       [--full] [--lr 1e-4] [--frames 256]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench_train import PRESET, synthetic_batch
from dex_tts_tpu.config import build_model
from dex_tts_tpu.models.dit import DiTConfig
from dex_tts_tpu.models.tts import DeXTTS
from dex_tts_tpu.ops import fix_len_compatibility
from dex_tts_tpu.train import create_train_state, make_train_step
from dex_tts_tpu.utils import Config


def tiny_dex(dtype="float32"):
    # mirrors tests/test_models.py tiny_dex but with n_feats=80 so the
    # bench_train synthetic batch shapes apply unchanged
    dit = DiTConfig(patch_size=3, stride_size=2, hidden_size=32, depth=1,
                    num_heads=2, mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2,
                    grid_h=20)
    return DeXTTS(
        n_vocab=149, n_feats=80, compute_dtype=dtype,
        enc_channels=24, enc_filter_channels=32,
        enc_filter_channels_dp=16, enc_heads=2, enc_layers=2, dec_dim=8,
        dec_dim_mults=(1, 2), dit=dit, tv_c_h=12, tv_c_out=24, tv_c_out_g=24,
        tv_layers=2, tv_n_emb=16, lf0_c_h=12, lf0_c_out=24, lf0_c_out_g=24,
        lf0_layers=1, tiv_c_h=16, tiv_c_out=8, tiv_layers=2,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="32,128")
    p.add_argument("--steps", type=int, default=21)
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--max-grad", type=float, default=None)
    p.add_argument("--full", action="store_true",
                   help="full ESD model (TPU scale) instead of tiny")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="denoiser compute dtype (the recorded b128 blow-up "
                        "was bench_train --dtype bfloat16)")
    p.add_argument("--out-size", type=int, default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin ignores "
                        "JAX_PLATFORMS=cpu; must set before first backend use)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = Config(PRESET)
    lr = args.lr if args.lr is not None else float(cfg.train.lr)
    max_grad = (args.max_grad if args.max_grad is not None
                else float(cfg.train.get("max_grad", 5.0)))
    cfg.model.decoder.compute_dtype = args.dtype
    model = build_model(cfg) if args.full else tiny_dex(args.dtype)
    out_size = args.out_size if args.out_size is not None else (
        fix_len_compatibility(int(cfg.train.fix_len
                                  * cfg.preprocess.sample_rate
                                  / cfg.preprocess.hop_length)))
    print(f"backend={jax.default_backend()} lr={lr} max_grad={max_grad} "
          f"out_size={out_size} full={args.full}", flush=True)

    for b in [int(s) for s in args.batches.split(",")]:
        batch = synthetic_batch(b, args.frames)
        state, tx = create_train_state(model, batch, lr=lr,
                                       max_grad=max_grad, out_size=out_size)
        step = jax.jit(
            make_train_step(model, tx, out_size=out_size,
                            ema_decay=float(cfg.train.get("ema_decay",
                                                          0.99999))),
            donate_argnums=(0,))
        print(f"\n=== batch {b} ===", flush=True)
        for i in range(args.steps):
            state, metrics = step(state, batch)
            m = {k: float(v) for k, v in metrics.items()}
            print(f"step {i:3d} " + " ".join(
                f"{k}={m[k]:10.4f}" for k in sorted(m)), flush=True)


if __name__ == "__main__":
    main()
