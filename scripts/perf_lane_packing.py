"""Is BigVGAN's late-stage HBM bandwidth wasted on lane padding?

Hypothesis (VERDICT r4 item 1 attack): v5e vector memory moves (8, 128)
tiles; a (B, T, C) activation with C = 24 or 48 in the minor dimension
fills only C/128 of every lane tile, so each HBM pass may move up to
128/C× the useful bytes. BigVGAN's last two stages (C=48 @ T=98304,
C=24 @ T=196608 for 768-frame batches) would then run at ~2.7-5.3× the
necessary traffic — matching the observed ~24-38%-of-ceiling rooflines.

Measured probes, interleaved in one process (same discipline as
scripts/perf_bigvgan.py; subtract ~30 ms dispatch, random jit args):

  copy_nwc      y = x·1.0001 on (B, T, C)           — layout-limited BW
  copy_packed   same bytes as (B, T/f, f·C)          — full-lane BW
  conv_nwc      dense nn.Conv-style k-tap conv       — the AMP block op
  conv_packed   SAME math as conv_nwc on the packed layout via a
                block-Toeplitz kernel (space-to-channel: f time samples
                folded into channels, dense conv over f·C channels).
                Numerics asserted allclose against conv_nwc.
  conv_ncw      the same conv with T minor (NCW)     — alternative layout

If copy_packed ≫ copy_nwc the padding hypothesis is confirmed and
conv_packed is the candidate production lowering for the late stages.

Run on the TPU: python scripts/perf_lane_packing.py [rounds]
(--smoke: tiny shapes on CPU, numerics/plumbing only.)

reference: DEX-TTS/bigvgan/models.py:35-94 (the AMP conv being packed).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

SMOKE = "--smoke" in sys.argv
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

import jax.lax as lax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

HBM_GBPS = 819e9
DISPATCH_S = 0.030 if not SMOKE else 0.0


def conv_nwc(x, w, dilation: int = 1):
    """Dense SAME conv over (B, T, C): the AMP-block op."""
    k = w.shape[0]
    pad = (k * dilation - dilation) // 2
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def conv_ncw(x_ncw, w, dilation: int = 1):
    k = w.shape[0]
    pad = (k * dilation - dilation) // 2
    # WIO -> (k, C_in, C_out); NCW wants OIW kernels
    return lax.conv_general_dilated(
        x_ncw, jnp.transpose(w, (2, 1, 0)).astype(x_ncw.dtype),
        window_strides=(1,), padding=[(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NCW", "OIW", "NCW"),
    )


def pack(x, f: int):
    """(B, T, C) -> (B, T/f, f·C); slot i holds sample t·f+i."""
    b, t, c = x.shape
    assert t % f == 0
    return x.reshape(b, t // f, f * c)


def unpack(xp, f: int):
    b, tp, fc = xp.shape
    return xp.reshape(b, tp * f, fc // f)


def packed_kernel(w: np.ndarray, f: int, dilation: int = 1):
    """Block-Toeplitz kernel K so that
    conv_packed(pack(x), K) == pack(conv_nwc(x, w)) (SAME padding).

    w: (k, C, C). Output K: (K_t, f·C, f·C) with packed-tap range
    q ∈ [qmin, qmax] from j + a·d - pad over j ∈ [0, f), a ∈ [0, k).
    Returns (K, pad_left_packed) for an explicit-pad VALID conv."""
    k, c_in, c_out = w.shape
    pad = (k * dilation - dilation) // 2
    offs = [
        (j, a, j + a * dilation - pad) for j in range(f) for a in range(k)
    ]
    qmin = min(o // f for _, _, o in offs)
    qmax = max(o // f for _, _, o in offs)
    kt = qmax - qmin + 1
    K = np.zeros((kt, f * c_in, f * c_out), w.dtype)
    for j, a, o in offs:
        q, i = o // f, o % f
        # output slot j at packed row t' pulls input slot i at row t'+q
        K[q - qmin, i * c_in:(i + 1) * c_in, j * c_out:(j + 1) * c_out] += (
            w[a]
        )
    return jnp.asarray(K), -qmin


def conv_packed(xp, K, pad_left: int):
    kt = K.shape[0]
    return lax.conv_general_dilated(
        xp, K.astype(xp.dtype), window_strides=(1,),
        padding=[(pad_left, kt - 1 - pad_left)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


N_ITERS = 4 if SMOKE else 32


def bench(fn, *args, rounds=5):
    """Per-application seconds of fn(x, *rest) with the op repeated
    N_ITERS times inside one jit via lax.scan (carry = the activation):
    the ~30 ms remote dispatch amortizes away, and scan iterations
    cannot fuse with each other, so each application really moves its
    HBM bytes. fn must map its first arg to a same-shaped output."""

    def looped(x, *rest):
        def body(h, _):
            return fn(h, *rest), ()

        out, _ = jax.lax.scan(body, x, None, length=N_ITERS)
        return out

    f = jax.jit(looped)
    float(jnp.sum(f(*args)))  # compile + warm
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)))
        ts.append(time.perf_counter() - t0)
    return max(float(np.median(ts)) - DISPATCH_S, 1e-9) / N_ITERS


def main():
    argv = [a for a in sys.argv[1:] if a != "--smoke"]
    rounds = int(argv[0]) if argv else (2 if SMOKE else 5)
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # ---- numerics: packed == plain on a small case ----
    for dil in (1, 3, 5):
        b, t, c, k, f = 2, 256, 8, 3, 8
        x = rng.standard_normal((b, t, c)).astype(np.float32)
        w = rng.standard_normal((k, c, c)).astype(np.float32) * 0.2
        ref = np.asarray(conv_nwc(jnp.asarray(x), jnp.asarray(w), dil))
        K, pl = packed_kernel(w, f, dil)
        got = np.asarray(
            unpack(conv_packed(pack(jnp.asarray(x), f), K, pl), f)
        )
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    print("numerics: conv_packed == conv_nwc (dil 1/3/5) OK", flush=True)

    B = 2 if SMOKE else 16
    stages = [(1024, 8, 4)] if SMOKE else [
        (98304, 48, 2),   # stage 4: f=2  -> 96 lanes... use f to reach >=128
        (98304, 48, 4),   # f=4 -> 192 channels
        (196608, 24, 8),  # stage 5: f=8 -> 192 channels
    ]
    for dtype in (["float32"] if SMOKE else ["float32", "bfloat16"]):
        dt = jnp.dtype(dtype)
        bytes_per = dt.itemsize
        print(f"\n=== dtype {dtype} (B={B}) ===", flush=True)
        for t, c, f in stages:
            x = jnp.asarray(
                rng.standard_normal((B, t, c)), dt
            )
            xp = pack(x, f)
            # unit-variance-preserving scale: 32 chained applications in
            # the scan bench must neither overflow nor denormal-underflow
            w3 = rng.standard_normal((3, c, c)).astype(np.float32) / np.sqrt(
                3 * c
            )
            w = jnp.asarray(w3)
            K, pl = packed_kernel(w3, f)
            moved = 2 * B * t * c * bytes_per  # 1 read + 1 write
            ideal_ms = moved / HBM_GBPS * 1e3

            t_copy = bench(lambda a: a * 1.0001, x, rounds=rounds)
            t_copy_p = bench(lambda a: a * 1.0001, xp, rounds=rounds)
            t_conv = bench(lambda a, ww: conv_nwc(a, ww), x, w,
                           rounds=rounds)
            t_conv_p = bench(
                lambda a, kk: conv_packed(a, kk, pl), xp, K, rounds=rounds
            )
            x_ncw = jnp.swapaxes(x, 1, 2)
            t_conv_n = bench(
                lambda a, ww: conv_ncw(a, ww), x_ncw, w, rounds=rounds
            )
            print(
                f"T={t:7d} C={c:3d} f={f} (fC={f*c:4d}) "
                f"ideal {ideal_ms:5.1f} ms | "
                f"copy {t_copy*1e3:6.1f} ({ideal_ms/(t_copy*1e3)*100:4.0f}%) "
                f"packed-copy {t_copy_p*1e3:6.1f} "
                f"({ideal_ms/(t_copy_p*1e3)*100:4.0f}%) | "
                f"conv {t_conv*1e3:6.1f} "
                f"packed-conv {t_conv_p*1e3:6.1f} "
                f"({t_conv/t_conv_p:4.2f}x) "
                f"ncw-conv {t_conv_n*1e3:6.1f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
