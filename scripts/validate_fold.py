"""Op-level exactness receipt for the folded snake kernel on real TPU.

The whole-generator SNR in scripts/perf_bigvgan.py saturates at ~16 dB
for ANY perturbed variant (a 112 M-param random-init GAN generator with
a tanh output chaotically amplifies bf16-level differences), so it
cannot distinguish kernel error from bf16 storage error. This script
measures the op itself: per BigVGAN stage shape, polyphase f32, fold
f32, and fold bf16 on the TPU against a float64 CPU polyphase oracle.

If SNR(fold f32) ≈ SNR(polyphase f32), the kernel adds no error beyond
XLA's own conv input rounding; fold bf16's gap to those is the bf16
storage cost alone.

Run on the TPU host: python scripts/validate_fold.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.ops import snake as sk

STAGES = [(3072, 768), (12288, 384), (24576, 192),
          (49152, 96), (98304, 48), (196608, 24)]
B = 4


def snr_db(x, ref):
    x = np.asarray(x, np.float64)
    ref = np.asarray(ref, np.float64)
    num = float((ref ** 2).sum())
    den = float(((x - ref) ** 2).sum()) + 1e-30
    return 10 * np.log10(num / den), float(np.abs(x - ref).max())


def main():
    print(f"backend={jax.default_backend()}")
    jax.config.update("jax_enable_x64", True)
    for t, c in STAGES:
        rng = np.random.default_rng(t)
        x = rng.standard_normal((B, t, c))
        al = rng.standard_normal((c,)) * 0.1
        ib = rng.standard_normal((c,)) * 0.1

        # float64 oracle on CPU (polyphase is straight-line math)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            oracle = sk.snake_antialias_polyphase(
                jnp.asarray(x, jnp.float64), jnp.asarray(al, jnp.float64),
                jnp.asarray(ib, jnp.float64))
            oracle = np.asarray(oracle)

        xf = jnp.asarray(x, jnp.float32)
        alf = jnp.asarray(al, jnp.float32)
        ibf = jnp.asarray(ib, jnp.float32)
        outs = {
            "polyphase f32": jax.jit(sk.snake_antialias_polyphase)(
                xf, alf, ibf),
            "fold f32": jax.jit(
                lambda a, b, d: sk.snake_antialias(a, b, d, impl="fold")
            )(xf, alf, ibf),
            "fold bf16": jax.jit(
                lambda a, b, d: sk.snake_antialias(a, b, d, impl="fold")
            )(xf.astype(jnp.bfloat16), alf.astype(jnp.bfloat16),
              ibf.astype(jnp.bfloat16)),
        }
        line = f"T={t:7d} C={c:4d}"
        for name, out in outs.items():
            s, mx = snr_db(np.asarray(out, np.float32), oracle)
            line += f" | {name}: {s:6.1f} dB max|e| {mx:.2e}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
