"""Interleaved A/B: polynomial sin² vs XLA sin in the bf16 fold snake.

r5 profile attribution (trace_top_ops on bench.py --vocoder bigvgan
--profile): the fold-snake custom-calls are 662 of the bf16 generator's
1225 ms (91 calls x ~6.6 ms, each ~3-5% of its 2-pass bandwidth ideal)
— VPU-compute-bound, with XLA's precise sin a large share of the
per-element ops. ops/snake.py:_sin2_fast replaces the two sins with a
range-reduced degree-7 polynomial (~10 VPU ops; max err 8.8e-6 in f32,
~500x below bf16 rounding).

Run on the TPU: python scripts/perf_fastsin.py [rounds]
Whole bf16-fold generator, batch 16 x 768 frames, same-process
interleaved medians + max|Δ| between the two lowerings.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

SMOKE = "--smoke" in sys.argv
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dex_tts_tpu.models.vocoder import BigVGANConfig, BigVGANGenerator  # noqa: E402
from dex_tts_tpu.ops import snake  # noqa: E402

B, TY = (2, 64) if SMOKE else (16, 768)
DISPATCH_S = 0.0 if SMOKE else 0.030


def main():
    argv = [a for a in sys.argv[1:] if a != "--smoke"]
    rounds = int(argv[0]) if argv else (1 if SMOKE else 6)
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, 80, TY)) * 1.5, jnp.float32)

    cfg = BigVGANConfig(num_mels=80, dtype="bfloat16", snake_impl="fold")
    model = BigVGANGenerator(cfg)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), mel[:1])["params"]
    )()
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
         for p, k in zip(leaves, ks)],
    )

    compiled = {}
    for name, fast in (("exact_sin", False), ("poly_sin", True)):
        snake.set_snake_fast_sin(fast)
        t0 = time.time()
        exe = (
            jax.jit(lambda p, m: model.apply({"params": p}, m))
            .lower(params, mel)
            .compile()
        )
        # force real execution under this trace-time setting
        out = np.asarray(exe(params, mel), np.float32)
        compiled[name] = (exe, out)
        print(f"compiled {name} in {time.time()-t0:.0f}s", flush=True)
    snake.set_snake_fast_sin(None)

    d = np.abs(compiled["poly_sin"][1] - compiled["exact_sin"][1])
    print(f"max|poly - exact| on bf16 output: {d.max():.4e}", flush=True)

    times = {n: [] for n in compiled}
    for _ in range(rounds):
        for n, (exe, _) in compiled.items():
            t0 = time.perf_counter()
            float(jnp.sum(exe(params, mel)))
            times[n].append(time.perf_counter() - t0)
    walls = {
        n: max(float(np.median(ts)) - DISPATCH_S, 1e-9)
        for n, ts in times.items()
    }
    audio_s = B * TY * 256 / 22050
    for n, w in walls.items():
        print(f"{n:10s} wall {w*1e3:7.1f} ms  RTF {w/audio_s:.5f}",
              flush=True)
    print(f"speedup poly vs exact: "
          f"{walls['exact_sin']/walls['poly_sin']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
