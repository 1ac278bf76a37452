"""Sub-pixel (polyphase) lowering of the vocoder upsampler convs.

The reference upsamples with ConvTranspose1d (DEX-TTS/hifigan/models.py:
125-133, bigvgan/models.py:156-164). `flax.linen.ConvTranspose` lowers
that through `lax.conv_transpose`, i.e. a conv over a stride-dilated
(zero-inserted) input: for stride u only 1/u of the kernel taps ever meet
a nonzero sample, so the MXU grinds through u× the useful MACs (16-tap
kernels at u=8 → 8× waste) and the dilated activation costs u× the HBM
traffic if materialized.

`SubpixelConvTranspose` computes the identical math as a *dense* stride-1
conv producing u·C_out channels (one output phase per group of C_out
lanes) followed by a reshape interleave — the depth-to-space trick. Per
output sample only ceil(k/u)(+1 for phase straddle) taps are computed.
The parameter tree (`kernel` of shape (k, C_out, C_in) — flax
`transpose_kernel=True` layout — and `bias`) is identical to
`nn.ConvTranspose`, so the two lowerings are checkpoint-interchangeable;
`tests/test_vocoder.py` asserts bit-level-noise parity at the generator's
(k, u) pairs.

Derivation: torch ConvTranspose1d with padding p_t = (k-u)//2 gives
y[u·m + r] = Σ_d x[m-d]·W[κ] at κ = u·d + r + p_t for the d with
0 ≤ κ < k. The taps d span [d_min, d_max] = [-⌊(u-1+p_t)/u⌋, ⌊(k-1-p_t)/u⌋];
phases that don't use a tap get a zero weight.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp


def subpixel_weights(kernel: jax.Array, stride: int, torch_pad: int):
    """(k, C_out, C_in) ConvTranspose kernel → ((K', C_in, u·C_out) dense
    stride-1 conv kernel, d_max, d_min). Static index math in numpy."""
    k, c_out, _ = kernel.shape
    u = stride
    d_max = (k - 1 - torch_pad) // u
    d_min = -((u - 1 + torch_pad) // u)
    n_taps = d_max - d_min + 1
    q = np.arange(n_taps)
    r = np.arange(u)
    kappa = u * (d_max - q)[:, None] + r[None, :] + torch_pad  # (K', u)
    valid = (kappa >= 0) & (kappa < k)
    gathered = kernel[np.clip(kappa, 0, k - 1)]  # (K', u, C_out, C_in)
    gathered = jnp.where(valid[..., None, None], gathered, 0)
    dense = jnp.transpose(gathered, (0, 3, 1, 2)).reshape(
        n_taps, kernel.shape[2], u * c_out
    )
    return dense, d_max, d_min


class SubpixelConvTranspose(nn.Module):
    """Drop-in for nn.ConvTranspose(features, (k,), strides=(u,),
    padding=[(k-1-(k-u)//2,)*2], transpose_kernel=True) — the vocoder
    upsampler form (output length = u·T). Same params, dense lowering."""

    features: int
    kernel_size: int
    stride: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):  # (B, T, C_in) → (B, u·T, features)
        k, u = self.kernel_size, self.stride
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, self.features, c_in),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dense, d_max, d_min = subpixel_weights(kernel, u, (k - u) // 2)
        dt = jnp.dtype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(dt),
            dense.astype(dt),
            window_strides=(1,),
            padding=[(d_max, -d_min)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        b, t, _ = y.shape
        y = y.reshape(b, t * u, self.features)
        return y + bias.astype(dt)
