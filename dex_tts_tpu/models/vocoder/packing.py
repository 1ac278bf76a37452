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
    C already fills the lanes (or nothing divides)."""
    if c >= lanes:
        return 1
    f = 1
    while f * c < lanes:
        f *= 2
    return f if t % f == 0 else 1


def packed_kernel(w: jnp.ndarray, f: int, dilation: int = 1):
    """Block-Toeplitz kernel K with conv(pack(x), K) == pack(conv(x, w))
    for a SAME-padded stride-1 conv. w: (k, C_in, C_out) →
    (K, pad_left) with K: (K_t, f·C_in, f·C_out). Built with static
    indices — traces to K_t fixed slabs, hoisted by XLA as a loop
    constant of a few hundred KB."""
    k, c_in, c_out = w.shape
    pad = (k * dilation - dilation) // 2
    offs = [(j, a, j + a * dilation - pad) for j in range(f) for a in range(k)]
    qmin = min(o // f for _, _, o in offs)
    qmax = max(o // f for _, _, o in offs)
    kt = qmax - qmin + 1
    K = jnp.zeros((kt, f * c_in, f * c_out), w.dtype)
    for j, a, o in offs:
        q, i = o // f - qmin, o % f
        K = K.at[q, i * c_in:(i + 1) * c_in, j * c_out:(j + 1) * c_out].add(
            w[a]
        )
    return K, -qmin


class PackedTimeConv(nn.Module):
    """SAME-padded dense 1-D conv over (B, T, C) with the packed lowering
    when it pays. Param-compatible with the nn.Conv it replaces."""

    features: int
    kernel_size: int
    dilation: int = 1
    dtype: str = "float32"
    impl: str = "auto"  # auto | plain | packed

    @nn.compact
    def __call__(self, x):
        b, t, c_in = x.shape
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, c_in, self.features),
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        dtype = jnp.dtype(self.dtype)
        impl = self.impl
        if impl == "auto":
            # packed pays on TPU whenever the channel count underfills
            # the 128 lanes (measured 2-4x at C=24..48)
            impl = (
                "packed" if jax.default_backend() == "tpu" else "plain"
            )
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
