"""Space-to-channel packed 1-D convolution for narrow-channel stages.

Why (measured, scripts/perf_lane_packing.py, v5e 2026-08-20): XLA's 1-D
conv at BigVGAN's late-stage widths wastes most of the HBM bandwidth —
a dense k=3 conv over (16, 196608, 24) runs at ~7% of the 2-pass
bandwidth ideal (9.9 ms f32 / 5.0 ms bf16 vs 0.7/0.4 ms ideal), while a
plain elementwise pass over the same tensor achieves 84–93% — the
problem is the conv lowering at C ≪ 128 lanes, not the tensor layout.

Fix: fold f consecutive time samples into channels — (B, T, C) →
(B, T/f, f·C), a free reshape (the packed view is the same row-major
memory) — and run ONE dense conv over f·C ≥ 128 channels whose
block-Toeplitz kernel reproduces the original conv exactly:

    out slot j at packed row t' needs input sample t'·f + j + a·d − pad
    = row t'+q, slot i, with  q = ⌊(j+a·d−pad)/f⌋, i = (j+a·d−pad) mod f
    ⇒ K[q, i·C:(i+1)·C, j·C:(j+1)·C] += W[a]   over j ∈ [0,f), a ∈ [0,k)

Measured per-op speedups at batch 16: C=24 (f=8): 4.0× f32 / 4.1× bf16;
C=48 (f=2 or 4): 2.0–2.1× both dtypes. FLOPs grow ~K_t·f/k ≈ 3–8×, but
these convs sit 8–25× below the MXU roofline, so the trade is free.

**Whole-generator verdict (roofline_bigvgan 2026-08-20): a NET LOSS —
bf16 1225→1370 ms, f32 1478→1944 ms.** In-graph, the pack/unpack
reshapes around each conv are not free: against the conv-operand tiled
layouts they become real relayout copies (+75 GB bf16 / +292 GB f32 of
post-fusion bytes accessed), which out-eat the per-conv win. The
isolated probe had the activation born and consumed in the packed
layout — exactly the condition a future whole-stage packed pipeline
(packed snake + convs, ONE pack/unpack per stage) would restore. Until
that exists the lowering is opt-in (`conv_impl="packed"`), and `auto`
resolves to plain.

`PackedTimeConv` is a drop-in for `nn.Conv(features, (k,),
kernel_dilation=(d,), padding=SAME)` with IDENTICAL parameter shapes and
names ({kernel: (k, C_in, C_out), bias: (C_out,)}) — checkpoints and
convert.py mappings are unchanged; only the lowering differs.

reference: DEX-TTS/bigvgan/models.py:35-137 (the AMP-block convs this
lowers).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def pick_pack(c: int, t: int, lanes: int = 128) -> int:
    """Smallest power-of-two f with f·C ≥ lanes that divides T; 1 when
    C already fills the lanes (or nothing divides).

    lanes=384 was also tried (r5): it matches the fold snake's canonical
    width at every BigVGAN stage, hoping the packed conv would share the
    snakes' folded layout and turn the boundary reshapes into views.
    Measured: still a whole-generator loss (bf16 fold 861.8 ms vs
    fold+packed@384 1019.1 — better than 1370 at lanes=128, but the
    wider block-Toeplitz kernel adds real MXU time, t_flops 112→183 ms,
    and extra bytes remain 263→332 GB). 128 stays the default (the
    isolated-op-optimal configuration)."""
    if c >= lanes:
        return 1
    f = 1
    while f * c < lanes:
        f *= 2
    return f if t % f == 0 else 1


import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _placement(k: int, f: int, dilation: int):
    """Static 0/1 tensor P: K[q, i·C+ci, j·C+co] = Σ_a P[q,i,j,a]·w[a,ci,co].
    Cached per (k, f, d) — a few KB of host constant."""
    pad = (k * dilation - dilation) // 2
    offs = [(j, a, j + a * dilation - pad) for j in range(f) for a in range(k)]
    qmin = min(o // f for _, _, o in offs)
    qmax = max(o // f for _, _, o in offs)
    kt = qmax - qmin + 1
    P = np.zeros((kt, f, f, k), np.float32)
    for j, a, o in offs:
        P[o // f - qmin, o % f, j, a] = 1.0
    return P, -qmin


def packed_kernel(w: jnp.ndarray, f: int, dilation: int = 1):
    """Block-Toeplitz kernel K with conv(pack(x), K) == pack(conv(x, w))
    for a SAME-padded stride-1 conv. w: (k, C_in, C_out) →
    (K, pad_left) with K: (K_t, f·C_in, f·C_out).

    Assembled as ONE einsum against a static placement tensor — the
    first version used ~k·f dynamic-update-slices per conv, and ~3000 of
    those tiny in-graph ops made the whole-generator packed variant
    SLOWER than plain (roofline_bigvgan r5: f32 1478→1952 ms) despite
    the 2-4x isolated-op win."""
    k, c_in, c_out = w.shape
    P, pad_left = _placement(k, f, dilation)
    K = jnp.einsum(
        "qija,aco->qicjo", jnp.asarray(P, w.dtype), w
    ).reshape(P.shape[0], f * c_in, f * c_out)
    return K, pad_left


class PackedTimeConv(nn.Module):
    """SAME-padded dense 1-D conv over (B, T, C) with the packed lowering
    when it pays. Param-compatible with the nn.Conv it replaces."""

    features: int
    kernel_size: int
    dilation: int = 1
    dtype: str = "float32"
    impl: str = "auto"  # auto | plain | packed
    kernel_init: object = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        b, t, c_in = x.shape
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (k, c_in, self.features),
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        dtype = jnp.dtype(self.dtype)
        impl = self.impl
        if impl == "auto":
            # plain: the isolated 2-4x win does not survive the per-conv
            # pack/unpack relayouts at whole-generator level (see
            # bigvgan._resolve_conv_impl and the module docstring)
            impl = "plain"
        f = (
            pick_pack(max(c_in, self.features), t)
            if impl == "packed"
            else 1
        )
        pad = (k * self.dilation - self.dilation) // 2
        if f == 1:
            out = jax.lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=(1,),
                padding=[(pad, pad)],
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            return out + bias.astype(out.dtype)
        K, pad_left = packed_kernel(kernel, f, self.dilation)
        kt = K.shape[0]
        xp = x.reshape(b, t // f, f * c_in)  # free: same row-major bytes
        out = jax.lax.conv_general_dilated(
            xp.astype(dtype),
            K.astype(dtype),
            window_strides=(1,),
            padding=[(pad_left, kt - 1 - pad_left)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        out = out.reshape(b, t, self.features)
        return out + bias.astype(out.dtype)
