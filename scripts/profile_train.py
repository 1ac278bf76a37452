"""TPU: train-step cost decomposition at the ESD bench shapes.

Times three full-graph variants and differences them:
  full   — the real train step (bench_train's graph)
  nomas  — MAS swapped for a trivial diagonal-path stub (same output
           shape/dtype); full − nomas ≈ the on-device Viterbi DP cost,
           i.e. the ceiling for a pallas wavefront MAS kernel
  fwd    — loss forward only (no grad/optimizer); full − fwd ≈ backward
           + Adam/EMA cost

Run: python scripts/profile_train.py [--batch 32] [--frames 256]
     [--dtype bfloat16] [--iters 10]
Remote-axon semantics: per-iteration scalar materialization; first
compile of each variant is minutes when the compile service is degraded.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(step, state, batch, iters):
    state2, metrics = step(state, batch)  # compile + warmup
    float(jax.tree.leaves(metrics)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        state2, metrics = step(state2, batch)
        float(jax.tree.leaves(metrics)[0])
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import bench_train as bt
    from dex_tts_tpu.config import build_model
    from dex_tts_tpu.ops import fix_len_compatibility
    from dex_tts_tpu.train import create_train_state, make_train_step
    from dex_tts_tpu.utils import Config

    cfg = Config(bt.PRESET)
    cfg.model.decoder.compute_dtype = args.dtype
    # pin one kernel across variants: "auto" would give the fwd-only
    # variant (train=False) flash while the full step runs einsum
    cfg.model.dit.attention = "einsum"
    model = build_model(cfg)
    batch = bt.synthetic_batch(args.batch, args.frames)
    out_size = fix_len_compatibility(
        int(2 * cfg.preprocess.sample_rate / cfg.preprocess.hop_length)
    )
    state, tx = create_train_state(model, batch, out_size=out_size)
    results = {}

    # -- full ----------------------------------------------------------
    step = jax.jit(make_train_step(model, tx, out_size=out_size))
    results["full"] = timed(step, state, batch, args.iters)
    print(f"full : {results['full']*1e3:8.2f} ms/step", flush=True)

    # -- nomas ---------------------------------------------------------
    import dex_tts_tpu.models.tts as tts_mod

    real_mas = tts_mod.maximum_path

    def stub_mas(value, mask):
        # diagonal monotone path, same (B, Tx, Ty) 0/1 output
        b, tx_, ty_ = value.shape
        ratio = tx_ / ty_
        cols = jnp.minimum(
            (jnp.arange(ty_) * ratio).astype(jnp.int32), tx_ - 1
        )
        path = jax.nn.one_hot(cols, tx_, axis=-1).transpose(1, 0)[None]
        return jnp.broadcast_to(path, value.shape) * mask

    tts_mod.maximum_path = stub_mas
    try:
        step_nm = jax.jit(make_train_step(model, tx, out_size=out_size))
        results["nomas"] = timed(step_nm, state, batch, args.iters)
    finally:
        tts_mod.maximum_path = real_mas
    print(f"nomas: {results['nomas']*1e3:8.2f} ms/step "
          f"(MAS ≈ {(results['full']-results['nomas'])*1e3:.2f} ms)",
          flush=True)

    # -- fwd -----------------------------------------------------------
    from dex_tts_tpu.train.trainer import make_valid_step

    vstep = jax.jit(make_valid_step(model, out_size=out_size))

    def fwd_step(state_, batch_):
        return state_, vstep(state_, batch_, state_.rng)

    results["fwd"] = timed(fwd_step, state, batch, args.iters)
    print(f"fwd  : {results['fwd']*1e3:8.2f} ms/step "
          f"(bwd+opt ≈ {(results['full']-results['fwd'])*1e3:.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
