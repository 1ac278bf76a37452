"""Op-level exactness receipt for the folded snake kernel on real TPU.

The whole-generator SNR in scripts/perf_bigvgan.py saturates at ~16 dB
for ANY perturbed variant (a 112 M-param random-init GAN generator with
a tanh output chaotically amplifies bf16-level differences), so it
cannot distinguish kernel error from bf16 storage error. This script
measures the op itself: per BigVGAN stage shape, polyphase f32, fold
f32, and fold bf16 on the live backend against a float64 NUMPY oracle
(the polyphase math re-derived in numpy — no jax_enable_x64, which
wedges when flipped after the axon TPU backend initialized).

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
B = 2


def oracle_np(x, al, ib, k=12):
    """float64 numpy twin of snake_antialias_polyphase (ops/snake.py)."""
    q = k // 4
    f0, f1, ge, go = sk._phase_filters(k)
    x = np.asarray(x, np.float64)
    al = np.asarray(al, np.float64)
    ib = np.asarray(ib, np.float64)
    t = x.shape[1]
    xe = np.concatenate(
        [np.repeat(x[:, :1], q, 1), x, np.repeat(x[:, -1:], q, 1)], 1)

    def dw(sig, taps):  # VALID stride-1 correlate along axis 1
        n = sig.shape[1] - len(taps) + 1
        out = np.zeros((sig.shape[0], n, sig.shape[2]))
        for a, tap in enumerate(taps):
            out += tap * sig[:, a:a + n]
        return out

    p0 = dw(xe[:, : t + k // 2 - 1], f0)
    p1 = dw(xe[:, 1: t + k // 2], f1)
    s0 = p0 + ib * np.sin(p0 * al) ** 2
    s1 = p1 + ib * np.sin(p1 * al) ** 2
    left = np.repeat(s0[:, :1], q, 1)
    right = np.repeat(s1[:, -1:], q, 1)
    s0p = np.concatenate([left, s0, right], 1)
    s1p = np.concatenate([left, s1, right], 1)
    return dw(s1p[:, : t + k // 2 - 1], ge) + dw(s0p[:, 1: t + k // 2], go)


def snr_db(x, ref):
    x = np.asarray(x, np.float64)
    num = float((ref ** 2).sum())
    den = float(((x - ref) ** 2).sum()) + 1e-30
    return 10 * np.log10(num / den), float(np.abs(x - ref).max())


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    for t, c in STAGES:
        rng = np.random.default_rng(t)
        x = rng.standard_normal((B, t, c)).astype(np.float32)
        al = (rng.standard_normal((c,)) * 0.1).astype(np.float32)
        ib = (rng.standard_normal((c,)) * 0.1).astype(np.float32)
        oracle = oracle_np(x, al, ib)

        xf, alf, ibf = jnp.asarray(x), jnp.asarray(al), jnp.asarray(ib)
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
