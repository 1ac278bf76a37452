"""TPU roofline for the BigVGAN generator at bench shapes: is the
vocoder compute-bound or HBM-bandwidth-bound on v5e?

Method: compile the generator alone, read the OPTIMIZED executable's
cost analysis (post-fusion flops + bytes accessed — the unoptimized
HLO overcounts bytes by every fused intermediate), time it interleaved
in-process, and compare against the v5e ceilings:

  t_flops = flops / peak_flops        (197 Tf/s bf16; f32 ~1/2 of that
                                       through the MXU -> both shown)
  t_bw    = bytes accessed / 819 GB/s (v5e HBM)

Whichever ceiling is larger is the speed-of-light bound; achieved-%
against it is the verdict. VERDICT r2 item 1 asked for exactly this
receipt if the AA/snake chain turned out bandwidth-bound.

Run on the TPU: python scripts/roofline_bigvgan.py [rounds]
(`--smoke` runs tiny shapes on CPU to exercise the harness; its
ceilings are v5e numbers, so treat smoke output as plumbing-only.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

SMOKE = "--smoke" in sys.argv
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.models.vocoder import BigVGANConfig, BigVGANGenerator

B, TY = (2, 64) if SMOKE else (16, 768)
HBM_GBPS = 819e9       # v5e HBM bandwidth
PEAK_BF16 = 197e12     # v5e dense bf16 matmul peak
DISPATCH_S = 0.030     # measured remote-tunnel per-dispatch overhead

VARIANTS = {
    "f32": BigVGANConfig(num_mels=80),
    # plain convs (the r4 shipped bf16 config)
    "bf16_fold": BigVGANConfig(
        num_mels=80, dtype="bfloat16", conv_impl="plain"
    ),
    # r5: space-to-channel packed AMP convs (vocoder/packing.py) —
    # measured 2-4.1x per conv at the late stages' C=24..48
    "bf16_fold_packed": BigVGANConfig(
        num_mels=80, dtype="bfloat16", conv_impl="packed"
    ),
    "f32_packed": BigVGANConfig(num_mels=80, conv_impl="packed"),
    # r5: batch-in-lanes fold — (T, B·C) rows, pure row-shift FIR taps,
    # boundary transposes cancel with XLA's {2,0,1} conv layouts
    "bf16_foldb": BigVGANConfig(
        num_mels=80, dtype="bfloat16", snake_impl="foldb"
    ),
}


def main():
    argv = [a for a in sys.argv[1:] if a != "--smoke"]
    no_snake = "--no-snake" in argv
    argv = [a for a in argv if a != "--no-snake"]
    only = None
    if "--variants" in argv:
        i = argv.index("--variants")
        only = argv[i + 1].split(",")
        del argv[i:i + 2]
        for name in only:
            assert name in VARIANTS, (name, list(VARIANTS))
    rounds = int(argv[0]) if argv else (1 if SMOKE else 5)
    if only:
        for name in list(VARIANTS):
            if name not in only:
                del VARIANTS[name]
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, 80, TY)) * 1.5, jnp.float32)

    base = BigVGANGenerator(BigVGANConfig(num_mels=80))
    params = jax.jit(
        lambda: base.init(jax.random.PRNGKey(0), mel[:1])["params"]
    )()
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
         for p, k in zip(leaves, ks)],
    )

    compiled, cost = {}, {}
    for name, cfg in VARIANTS.items():
        model = BigVGANGenerator(cfg)
        t0 = time.time()
        exe = (
            jax.jit(lambda p, m, model=model: model.apply({"params": p}, m))
            .lower(params, mel)
            .compile()
        )
        ca = exe.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        compiled[name] = exe
        cost[name] = ca or {}
        print(f"compiled {name} in {time.time()-t0:.0f}s "
              f"flops={cost[name].get('flops', 0)/1e9:.1f} G "
              f"bytes={cost[name].get('bytes accessed', 0)/1e9:.2f} GB",
              flush=True)

    times = {n: [] for n in VARIANTS}
    for r in range(rounds):
        for name, exe in compiled.items():
            t0 = time.perf_counter()
            float(jnp.sum(exe(params, mel)))
            times[name].append(time.perf_counter() - t0)
    audio_s = B * TY * 256 / 22050

    # Per-op receipt: the isolated anti-aliased snake at each stage shape
    # (T, C after each upsample; the generator runs ~18 of these per
    # stage). Ideal HBM time = 2 passes (read+write) at 819 GB/s; the
    # achieved-% column shows how far the op's XLA lowering is from the
    # bandwidth ceiling, independent of the whole-graph roofline.
    from dex_tts_tpu.ops.snake import snake_antialias

    cfg = next(iter(VARIANTS.values()))
    stage_shapes = []
    if not no_snake:
        t_stage, c_stage = TY, cfg.upsample_initial_channel
        for r in cfg.upsample_rates:
            t_stage, c_stage = t_stage * r, c_stage // 2
            stage_shapes.append((t_stage, c_stage))
        print(f"\n=== isolated snake_antialias per stage shape "
              f"(B={B}, f32, net of {DISPATCH_S*1e3:.0f} ms dispatch) ===")
    rng2 = np.random.default_rng(1)
    import functools

    for t_s, c_s in stage_shapes:
        xs = jnp.asarray(
            rng2.standard_normal((B, t_s, c_s)), jnp.float32)
        al = jnp.asarray(rng2.standard_normal((c_s,)) * 0.1, jnp.float32)
        ib = jnp.asarray(rng2.standard_normal((c_s,)) * 0.1, jnp.float32)
        byts = B * t_s * c_s * 4
        ideal = 2 * byts / HBM_GBPS
        for impl in ("polyphase", "fold"):
            f = jax.jit(functools.partial(snake_antialias, impl=impl))
            float(jnp.sum(f(xs, al, ib)))  # compile
            ts = []
            for _ in range(rounds):
                t0 = time.perf_counter()
                float(jnp.sum(f(xs, al, ib)))
                ts.append(time.perf_counter() - t0)
            net = max(float(np.median(ts)) - DISPATCH_S, 1e-9)
            print(f"T={t_s:7d} C={c_s:4d} {impl:9s} {net*1e3:7.2f} ms  "
                  f"ideal(2-pass) {ideal*1e3:5.2f} ms  "
                  f"{ideal/net*100:5.1f}% of HBM ceiling", flush=True)

    print(f"\n=== v5e roofline (batch {B}, {TY} frames, "
          f"{audio_s:.1f}s audio/batch) ===")
    for name in VARIANTS:
        flops = float(cost[name].get("flops", 0))
        byts = float(cost[name].get("bytes accessed", 0))
        wall = float(np.median(times[name])) - DISPATCH_S
        t_fl = flops / PEAK_BF16
        t_bw = byts / HBM_GBPS
        bound = "bandwidth" if t_bw > t_fl else "compute"
        sol = max(t_bw, t_fl)
        print(
            f"{name:9s} wall {wall*1e3:7.1f} ms | "
            f"t_flops {t_fl*1e3:6.1f} ms  t_bw {t_bw*1e3:6.1f} ms "
            f"-> {bound}-bound | speed-of-light {sol*1e3:6.1f} ms "
            f"({sol/wall*100:.0f}% achieved) | "
            f"eff-BW {byts/wall/1e9:.0f} GB/s "
            f"({byts/wall/HBM_GBPS*100:.0f}% of HBM)"
        )


if __name__ == "__main__":
    main()
