"""Interleaved A/B of the fold kernel's row-block size on the whole
bf16 generator (the r5 VMEM-aware picker briefly allowed rb=512 — this
measures whether bigger blocks help or hurt at bench shapes).

Run on the TPU: python scripts/perf_foldrb.py [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.models.vocoder import BigVGANConfig, BigVGANGenerator
from dex_tts_tpu.ops import snake

B, TY = 16, 768
DISPATCH_S = 0.030


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, 80, TY)) * 1.5, jnp.float32)
    model = BigVGANGenerator(BigVGANConfig(num_mels=80, dtype="bfloat16"))
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), mel[:1])["params"]
    )()

    compiled = {}
    for name, cands in (
        ("rb<=256", (256, 128, 64, 32, 16, 8)),
        ("rb<=512", (512, 256, 128, 64, 32, 16, 8)),
    ):
        snake._RB_CANDIDATES = cands
        t0 = time.time()
        exe = (
            jax.jit(lambda p, m: model.apply({"params": p}, m))
            .lower(params, mel)
            .compile()
        )
        float(jnp.sum(exe(params, mel)))
        compiled[name] = exe
        print(f"compiled {name} in {time.time()-t0:.0f}s", flush=True)
    snake._RB_CANDIDATES = (256, 128, 64, 32, 16, 8)

    times = {n: [] for n in compiled}
    for _ in range(rounds):
        for n, exe in compiled.items():
            t0 = time.perf_counter()
            float(jnp.sum(exe(params, mel)))
            times[n].append(time.perf_counter() - t0)
    for n, ts in times.items():
        w = max(float(np.median(ts)) - DISPATCH_S, 1e-9)
        print(f"{n:9s} wall {w*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
