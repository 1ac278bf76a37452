"""TPU: interleaved A/B of BigVGAN generator variants at bench shapes
(batch 16, 768 mel frames -> 196608 samples/item), with SNR receipts.

Knobs under test (VERDICT r2 item 1):
  - snake_taps: Kaiser tap count of the snake's 2x anti-alias filters
    (12 = reference, 8 trades stop-band attenuation for VPU FLOPs)
  - stage_dtypes: bf16 prefix of the wide early stages, f32 tail where
    waveform precision lives (one retile boundary)
  - dtype=bfloat16: the known-rejected full-bf16 config, re-measured in
    the same harness for comparability

Every variant runs on the SAME weights; SNR is 10*log10(|ref|^2/|err|^2)
vs the f32/k=12 baseline output. Weights are perturbed from init so
activations are non-degenerate. Timing is interleaved round-robin in one
process (tunnel drifts +-25% minute-to-minute) with a scalar materialized
per iteration.

Run on the TPU: python scripts/perf_bigvgan.py [rounds] [--variants a,b]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.models.vocoder import BigVGANConfig, BigVGANGenerator

B, TY = 16, 768
BF, F = "bfloat16", "float32"

VARIANTS = {
    "base_f32_k12": BigVGANConfig(num_mels=80),
    "f32_k8": BigVGANConfig(num_mels=80, snake_taps=8),
    "bf16x2": BigVGANConfig(num_mels=80, stage_dtypes=(BF, BF, F, F, F, F)),
    "bf16x4": BigVGANConfig(num_mels=80, stage_dtypes=(BF, BF, BF, BF, F, F)),
    "bf16x5": BigVGANConfig(num_mels=80, stage_dtypes=(BF, BF, BF, BF, BF, F)),
    "bf16_all": BigVGANConfig(num_mels=80, dtype=BF),
    "bf16x4_k8": BigVGANConfig(
        num_mels=80, stage_dtypes=(BF, BF, BF, BF, F, F), snake_taps=8
    ),
    "bf16x5_k8": BigVGANConfig(
        num_mels=80, stage_dtypes=(BF, BF, BF, BF, BF, F), snake_taps=8
    ),
    # f32 head, bf16 tail: measured speed gains live in the late (long-T)
    # stages while the SNR damage concentrates in the early stages, so
    # protect the head and quantize the tail.
    "f32x1_bf16": BigVGANConfig(
        num_mels=80, stage_dtypes=(F, BF, BF, BF, BF, BF)
    ),
    "f32x2_bf16": BigVGANConfig(
        num_mels=80, stage_dtypes=(F, F, BF, BF, BF, BF)
    ),
    # folded full-lane fused snake kernel (ops/snake.py:snake_antialias_fold)
    # — attacks the measured 2-10%-of-HBM-ceiling narrow-C stages directly
    "fold_f32": BigVGANConfig(num_mels=80, snake_impl="fold"),
    "fold_bf16": BigVGANConfig(num_mels=80, dtype=BF, snake_impl="fold"),
    # sub-pixel (depth-to-space) upsampler lowering: dense stride-1 conv
    # instead of lax.conv_transpose's zero-inserted input (u× wasted MACs
    # at the MXU) — exact same math/params (models/vocoder/upsample.py)
    "subpix_f32": BigVGANConfig(num_mels=80, upsample_impl="subpixel"),
    "subpix_bf16": BigVGANConfig(
        num_mels=80, dtype=BF, upsample_impl="subpixel"
    ),
    "subpix_fold_bf16": BigVGANConfig(
        num_mels=80, dtype=BF, snake_impl="fold", upsample_impl="subpixel"
    ),
}


def main():
    rounds = 3
    names = list(VARIANTS)
    for a in sys.argv[1:]:
        if a.isdigit():
            rounds = int(a)
        elif a.startswith("--variants="):
            names = a.split("=", 1)[1].split(",")
            unknown = set(names) - set(VARIANTS)
            if unknown:
                sys.exit(f"unknown variants {unknown}; known: {list(VARIANTS)}")
        else:
            sys.exit(f"usage: perf_bigvgan.py [rounds] [--variants=a,b]")

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, 80, TY)) * 1.5, jnp.float32)

    base_model = BigVGANGenerator(VARIANTS["base_f32_k12"])
    t0 = time.time()
    params = jax.jit(
        lambda: base_model.init(jax.random.PRNGKey(0), mel[:1])["params"]
    )()
    # perturb so snake alpha/beta leave the exp(0)=1 init point
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
         for p, k in zip(leaves, ks)],
    )
    print(f"init {time.time()-t0:.0f}s", flush=True)

    fns, outs = {}, {}
    for name in names:
        model = BigVGANGenerator(VARIANTS[name])
        fns[name] = jax.jit(
            lambda p, m, model=model: model.apply({"params": p}, m)
        )
        t0 = time.time()
        outs[name] = np.asarray(fns[name](params, mel))
        assert np.isfinite(outs[name]).all(), name
        print(f"compiled {name} in {time.time()-t0:.0f}s", flush=True)

    ref = outs["base_f32_k12"] if "base_f32_k12" in outs else outs[names[0]]
    for name in names:
        err = outs[name] - ref
        p_sig = float(np.mean(ref**2))
        p_err = float(np.mean(err**2))
        snr = 10 * np.log10(p_sig / p_err) if p_err > 0 else float("inf")
        print(f"SNR[{name} vs {names[0]}] = {snr:.1f} dB "
              f"(max|err| {np.abs(err).max():.4f})", flush=True)

    audio_s = B * TY * 256 / 22050
    times = {n: [] for n in names}
    for r in range(rounds):
        for name in names:
            t0 = time.perf_counter()
            float(jnp.sum(fns[name](params, mel)))
            times[name].append(time.perf_counter() - t0)
        print(f"round {r}: " + " ".join(
            f"{n}={times[n][-1]*1e3:.0f}ms" for n in names), flush=True)

    base_ms = np.median(times[names[0]]) * 1e3
    print(f"\n=== medians over {rounds} rounds "
          f"(audio {audio_s:.1f}s/batch, ~30ms dispatch incl.) ===")
    for name in names:
        ms = np.median(times[name]) * 1e3
        print(f"{name:14s} {ms:7.1f} ms  voc-RTF {ms/1e3/audio_s:.5f}  "
              f"speedup x{base_ms/ms:.2f}")


if __name__ == "__main__":
    main()
