"""TPU: same-process A/B of the train step with scan vs pallas MAS.

The remote tunnel's throughput drifts minute to minute, so cross-run
comparisons lie; this interleaves the two compiled steps A/B/A/B in one
process and reports paired means.

Run: python scripts/perf_mas_ab.py [--batch 32] [--frames 256] [--rounds 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--rounds", type=int, default=6)
    args = p.parse_args()

    import bench_train as bt
    from dex_tts_tpu.config import build_model
    from dex_tts_tpu.ops import fix_len_compatibility, mas
    from dex_tts_tpu.train import create_train_state, make_train_step
    from dex_tts_tpu.utils import Config

    cfg = Config(bt.PRESET)
    cfg.model.decoder.compute_dtype = "bfloat16"
    model = build_model(cfg)
    batch = bt.synthetic_batch(args.batch, args.frames)
    out_size = fix_len_compatibility(
        int(2 * cfg.preprocess.sample_rate / cfg.preprocess.hop_length)
    )
    state, tx = create_train_state(model, batch, out_size=out_size)

    steps = {}
    for backend in ("scan", "pallas"):
        mas.set_mas_backend(backend)
        steps[backend] = jax.jit(make_train_step(model, tx, out_size=out_size))
        s2, m = steps[backend](state, batch)  # compile + warmup
        print(f"{backend}: compiled, loss="
              f"{float(m['total_loss']):.4f}", flush=True)
    mas.set_mas_backend(None)

    times = {"scan": [], "pallas": []}
    for r in range(args.rounds):
        for backend in ("scan", "pallas"):
            s = state
            t0 = time.perf_counter()
            for _ in range(args.iters):
                s, m = steps[backend](s, batch)
                float(m["total_loss"])
            times[backend].append((time.perf_counter() - t0) / args.iters)
        a, b = times["scan"][-1], times["pallas"][-1]
        print(f"round {r}: scan {a*1e3:7.2f} ms  pallas {b*1e3:7.2f} ms",
              flush=True)

    ms = {k: sum(v) / len(v) * 1e3 for k, v in times.items()}
    print(f"mean: scan {ms['scan']:.2f} ms  pallas {ms['pallas']:.2f} ms  "
          f"(pallas {ms['scan']/ms['pallas']:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
