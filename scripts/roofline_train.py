"""TPU roofline for the DeX-TTS train step at bench shapes: is the
6.3%-MFU training loop compute-bound or HBM-bandwidth-bound on v5e?

VERDICT r3 item 4 asked for exactly this receipt: the batch sweep
(32/64/128 → 163/163/134 items/s) *suggests* per-item bandwidth-bound at
172-frame segments, but the claim was never backed by a bytes-vs-flops
roofline like scripts/roofline_bigvgan.py's.

Method (same as roofline_bigvgan): compile the jitted train step, read
the OPTIMIZED executable's cost analysis (post-fusion flops + bytes
accessed), time it interleaved in-process, and compare against v5e
ceilings:

  t_flops = flops / 197e12            (dense bf16 peak; f32 graphs get a
                                       conservative bound — see note)
  t_bw    = bytes accessed / 819 GB/s (v5e HBM)

Caveats baked in: the MAS DP is a lax.scan / pallas custom-call whose
body cost analysis counts once — its flops are negligible (max/add at
~2 ms of a ~200 ms step, CLAUDE.md), so the roofline is unaffected.
The train step has no other loop at accum_steps=1.

Run on the TPU host (NOTHING else on the host core):
  python scripts/roofline_train.py [rounds] [--batches 32,64,128]
                                   [--dtype float32|bfloat16]
  (--smoke: tiny shapes on CPU to exercise the harness; ceilings are v5e
  numbers, treat smoke output as plumbing-only.)
"""
import argparse
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

from bench_train import PRESET, synthetic_batch  # noqa: E402
from dex_tts_tpu.config import build_model  # noqa: E402
from dex_tts_tpu.ops import fix_len_compatibility  # noqa: E402
from dex_tts_tpu.train import create_train_state, make_train_step  # noqa: E402
from dex_tts_tpu.utils import Config  # noqa: E402

HBM_GBPS = 819e9    # v5e HBM bandwidth
PEAK_BF16 = 197e12  # v5e dense bf16 matmul peak (f32 ≈ 1/2 through MXU)
DISPATCH_S = 0.030  # measured remote-tunnel per-dispatch overhead


def main():
    p = argparse.ArgumentParser()
    p.add_argument("rounds", nargs="?", type=int, default=1 if SMOKE else 5)
    p.add_argument("--batches", default="4" if SMOKE else "32,64,128")
    p.add_argument("--frames", type=int, default=64 if SMOKE else 256)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    cfg = Config(PRESET)
    cfg.model.decoder.compute_dtype = args.dtype
    if SMOKE:
        # shrink to CPU-tractable widths, keep the real wiring.
        # Style-encoder dims must track the shrink: tv/lf0 c_out ==
        # enc n_channels (style fusion), 2·tiv c_out == dec mid channels
        # (TIVAdaptor time token, models/ref_encoder.py:267)
        cfg.model.encoder.n_channels = 24
        cfg.model.encoder.filter_channels = 32
        cfg.model.encoder.filter_channels_dp = 16
        cfg.model.encoder.n_layers = 2
        cfg.model.decoder.dim = 8
        cfg.model.dit.hidden_size = 32
        cfg.model.dit.depth = 1
        cfg.model.dit.conv_pos = 4
        cfg.model.dit.conv_pos_groups = 2
        for enc_key in ("tv_encoder", "lf0_encoder"):
            cfg.model[enc_key].c_h = 16
            cfg.model[enc_key].c_out = 24
            cfg.model[enc_key].c_out_g = 24
            cfg.model[enc_key].num_layer = 2
        cfg.model.tiv_encoder.c_h = 16
        cfg.model.tiv_encoder.c_out = 8
        cfg.model.tiv_encoder.num_layer = 2
    model = build_model(cfg)
    out_size = 16 if SMOKE else fix_len_compatibility(
        int(cfg.train.fix_len * cfg.preprocess.sample_rate
            / cfg.preprocess.hop_length))
    batches = [int(s) for s in args.batches.split(",")]
    print(f"backend={jax.default_backend()} dtype={args.dtype} "
          f"out_size={out_size}", flush=True)

    # params are batch-size independent: init ONCE (each create_train_state
    # over the degraded remote-compile tunnel costs minutes; the first run
    # of this script burned its whole timeout on 3x init+compile and died
    # before timing — hence also: time each config IMMEDIATELY after its
    # compile so partial results survive a timeout)
    state, tx = create_train_state(
        model, synthetic_batch(batches[0], args.frames),
        lr=float(cfg.train.lr),
        max_grad=float(cfg.train.get("max_grad", 5.0)),
        out_size=out_size)
    step = jax.jit(
        make_train_step(
            model, tx, out_size=out_size,
            ema_decay=float(cfg.train.get("ema_decay", 0.99999))))

    print(f"\n=== v5e train-step roofline ({args.frames}-frame bucket, "
          f"out_size {out_size}, {args.dtype}) ===", flush=True)
    for b in batches:
        batch = synthetic_batch(b, args.frames)
        t0 = time.time()
        exe = step.lower(state, batch).compile()
        ca = exe.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        ca = ca or {}
        print(f"b={b}: compiled in {time.time()-t0:.0f}s "
              f"flops={ca.get('flops', 0)/1e12:.3f} T "
              f"bytes={ca.get('bytes accessed', 0)/1e9:.2f} GB",
              flush=True)
        times = []
        _, m = exe(state, batch)
        float(m["total_loss"])  # warm dispatch before timing
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            _, metrics = exe(state, batch)
            float(metrics["total_loss"])  # force remote completion
            times.append(time.perf_counter() - t0)

        flops = float(ca.get("flops", 0))
        byts = float(ca.get("bytes accessed", 0))
        wall = max(float(np.median(times)) - DISPATCH_S, 1e-9)
        t_fl = flops / PEAK_BF16
        t_bw = byts / HBM_GBPS
        bound = "bandwidth" if t_bw > t_fl else "compute"
        sol = max(t_bw, t_fl)
        print(
            f"b={b:4d} wall {wall*1e3:7.1f} ms "
            f"({b/wall:6.1f} items/s) | t_flops {t_fl*1e3:6.1f} ms  "
            f"t_bw {t_bw*1e3:6.1f} ms -> {bound}-bound | "
            f"speed-of-light {sol*1e3:6.1f} ms ({sol/wall*100:.0f}% "
            f"achieved) | eff-BW {byts/wall/1e9:.0f} GB/s "
            f"({byts/wall/HBM_GBPS*100:.0f}% of HBM) | "
            f"MFU {flops/wall/PEAK_BF16*100:.1f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
