"""TPU A/B of exact-math lowerings for the DiT time-pos grouped conv.

Profiling (scripts/trace_top_ops.py on a bench.py --profile trace,
2026-08-19) showed `time_pos/pos_conv` is the single largest op in the
sampler loop: ~9.7 ms/step at bench shapes — more than all four flash-
attention blocks combined (~7.7 ms/step). It runs at ~19 TF/s ≈ 10% of
peak bf16, while its structural ceiling (32-out-channel groups → 32 of
128 MXU lanes) is ~25%. This script times exact reformulations of the
same math to see how much of that gap an XLA-level rewrite recovers:

  grouped     lax grouped conv (what nn.Conv emits today)
  vmap_g      vmap over the 8 groups of a dense 32->32 conv
  taps1d      16 row-taps, each a grouped 1-D conv over W, summed
  blockdiag   dense 256->256 conv with a block-diagonal kernel (16x
              the FLOPs, full MXU lanes)
  f32         the grouped conv in f32 (dtype control)

All variants are verified against `grouped` to bf16 tolerance first.
Shapes: x (16, 20, 192, 256) bf16, k=16, groups=8, pad (8,7)^2 — the
flagship DiT at the 768-frame bucket (models/dit.py:ConvTimePosEmbed).

Run on the TPU host: python scripts/perf_posconv.py [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 16, 20, 192, 256
K, G = 16, 8
CG = C // G  # 32
PAD = [(K // 2, K // 2 - 1), (K // 2, K // 2 - 1)]
DN = ("NHWC", "HWIO", "NHWC")
DISPATCH_S = 0.030
FLOPS = 2 * B * H * W * K * K * CG * C  # grouped-conv true flops


def grouped(x, w):  # w: (K, K, CG, C)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), PAD, dimension_numbers=DN, feature_group_count=G)


def vmap_g(x, w):
    xg = x.reshape(B, H, W, G, CG)
    wg = w.reshape(K, K, CG, G, CG)

    def one(xs, ws):  # xs (B,H,W,CG), ws (K,K,CG,CG)
        return jax.lax.conv_general_dilated(
            xs, ws, (1, 1), PAD, dimension_numbers=DN)

    out = jax.vmap(one, in_axes=(3, 3), out_axes=3)(xg, wg)
    return out.reshape(B, H, W, C)


def taps1d(x, w):
    # pad H once, then one grouped 1-D conv over W per row tap
    xp = jnp.pad(x, ((0, 0), PAD[0], (0, 0), (0, 0)))
    out = None
    for dh in range(K):
        xs = xp[:, dh:dh + H]  # (B,H,W,C)
        o = jax.lax.conv_general_dilated(
            xs, w[dh][None], (1, 1), [(0, 0), PAD[1]],
            dimension_numbers=DN, feature_group_count=G)
        out = o if out is None else out + o
    return out


def blockdiag(x, w):
    wd = jnp.zeros((K, K, C, C), w.dtype)
    for g in range(G):
        wd = wd.at[:, :, g * CG:(g + 1) * CG, g * CG:(g + 1) * CG].set(
            w[:, :, :, g * CG:(g + 1) * CG])
    return jax.lax.conv_general_dilated(
        x, wd, (1, 1), PAD, dimension_numbers=DN)


def f32(x, w):
    return grouped(x.astype(jnp.float32), w.astype(jnp.float32)).astype(
        x.dtype)


VARIANTS = {
    "grouped": grouped,
    "vmap_g": vmap_g,
    "taps1d": taps1d,
    "blockdiag": blockdiag,
    "f32": f32,
}


# --- in-context A/B: reproduce the e2e layout problem -----------------
# In the full sampler graph the SAME grouped conv costs ~9.7 ms/step
# (trace receipt) vs 4.5 ms isolated: XLA assigns the fusion a 5-D
# split layout bf16[16,20,192,8,32]{4,0,3,2,1} (32 lanes minor) driven
# by its producer/consumer. These variants embed the conv between a
# patchify-like producer and the gelu→mean→add→tokens consumer chain
# (models/dit.py:444-451) and test whether forcing a layout boundary
# recovers the isolated speed.

MID_H, MID_W, MID_C, D = 40, 384, 128, 256  # U-Net mid feature → DiT


def _context(x_mid, wp_, w_, proj, barrier: bool):
    # patchify: conv 3x3 stride 2 → (B, 20, 192, 256), as PatchEmbed2D
    h = jax.lax.conv_general_dilated(
        x_mid, wp_, (2, 2), [(1, 1), (1, 1)], dimension_numbers=DN)
    if barrier:
        h = jax.lax.optimization_barrier(h)
    pos = jax.lax.conv_general_dilated(
        h, w_, (1, 1), PAD, dimension_numbers=DN, feature_group_count=G)
    if barrier:
        pos = jax.lax.optimization_barrier(pos)
    pos = jax.nn.gelu(pos, approximate=False)
    pos = jnp.mean(pos, axis=1, keepdims=True)
    h = h + pos
    tokens = h.reshape(h.shape[0], -1, D)
    return tokens @ proj  # downstream consumer


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, K, CG, C)) * 0.05, jnp.bfloat16)

    fns, outs = {}, {}
    for name, fn in VARIANTS.items():
        f = jax.jit(fn)
        t0 = time.time()
        outs[name] = np.asarray(f(x, w), np.float32)
        print(f"compiled {name} in {time.time()-t0:.0f}s", flush=True)
        fns[name] = f
    ref = outs["grouped"]
    for name, o in outs.items():
        err = np.abs(o - ref).max()
        print(f"max|{name} - grouped| = {err:.3e}")

    # scan-amortized timing (r5): these 4-10 ms ops are noise-dominated
    # by the ~30 ms remote dispatch when timed one dispatch at a time;
    # N_ITERS chained applications inside one jit (scan iterations can't
    # fuse with each other) give a clean per-application figure
    N_ITERS = 16

    def looped(fn):
        def body(h, _):
            return fn(h, w), ()

        return jax.jit(lambda a: jax.lax.scan(body, a, None,
                                              length=N_ITERS)[0])

    lfns = {}
    for n, fn in VARIANTS.items():
        lf = looped(fn)
        t0 = time.time()
        float(jnp.sum(lf(x)))
        print(f"compiled looped {n} in {time.time()-t0:.0f}s", flush=True)
        lfns[n] = lf
    acc = {n: [] for n in lfns}
    for r in range(rounds):
        for n, f in lfns.items():
            t0 = time.perf_counter()
            float(jnp.sum(f(x)))
            acc[n].append(time.perf_counter() - t0)
    print(f"\n=== per-application medians over {rounds} rounds x "
          f"{N_ITERS} chained (net of {DISPATCH_S*1e3:.0f} ms dispatch; "
          f"true-math {FLOPS/1e9:.1f} GF) ===")
    for n, ts in acc.items():
        net = max(
            (float(np.median(ts)) - DISPATCH_S) / N_ITERS, 1e-9
        )
        tfs = FLOPS / net / 1e12
        print(f"{n:10s} {net*1e3:7.2f} ms  {tfs:6.1f} TF/s "
              f"({tfs/197*100:4.1f}% peak, {tfs/(197*0.25)*100:5.1f}% of "
              f"32-lane cap)", flush=True)

    # --- in-context layout A/B ---
    x_mid = jnp.asarray(
        rng.standard_normal((B, MID_H, MID_W, MID_C)) * 0.3, jnp.bfloat16)
    wp_ = jnp.asarray(
        rng.standard_normal((3, 3, MID_C, D)) * 0.05, jnp.bfloat16)
    proj = jnp.asarray(
        rng.standard_normal((D, D)) * 0.05, jnp.bfloat16)
    ctx = {
        "ctx_plain": jax.jit(lambda a, b, c, d: _context(a, b, c, d, False)),
        "ctx_barrier": jax.jit(lambda a, b, c, d: _context(a, b, c, d, True)),
    }
    outs2 = {}
    for n, f in ctx.items():
        t0 = time.time()
        outs2[n] = np.asarray(
            f(x_mid, wp_, w, proj), np.float32)
        print(f"compiled {n} in {time.time()-t0:.0f}s", flush=True)
    print("max|ctx_barrier - ctx_plain| =",
          f"{np.abs(outs2['ctx_barrier'] - outs2['ctx_plain']).max():.3e}")
    acc2 = {n: [] for n in ctx}
    for r in range(rounds):
        for n, f in ctx.items():
            t0 = time.perf_counter()
            float(jnp.sum(f(x_mid, wp_, w, proj)))
            acc2[n].append(time.perf_counter() - t0)
    print("\n=== in-context (patchify -> posconv -> gelu/mean/add -> "
          "tokens @ proj) ===")
    for n, ts in acc2.items():
        net = max(float(np.median(ts)) - DISPATCH_S, 1e-9)
        print(f"{n:12s} {net*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
