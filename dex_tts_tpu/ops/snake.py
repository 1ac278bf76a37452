"""Anti-aliased snake activation (BigVGAN's hot op) — fused pallas kernel.

reference: DEX-TTS/bigvgan/alias_free_torch/{act,resample,filter}.py +
bigvgan/activations.py:9-119. The reference composes: 2× zero-stuffed
Kaiser-sinc upsample → x + (1/β)·sin²(αx) → Kaiser-sinc low-pass +
decimate, materializing a 2T-length tensor and running 12-tap depthwise
convs over it. On v5e that chain was 75% of BigVGAN generator wall-clock
(the convs alone are 11%).

Two TPU-native implementations, numerically identical (float tolerance):

- `snake_antialias_polyphase` — pure XLA, the production path. Both
  12-tap filters split into even/odd polyphase branches so every tensor
  stays at length T (no zero-stuffing, no scatter). 1.64× the naive
  form on v5e (BigVGAN 2489 → 1515 ms at batch 16 / 768 frames).
- `snake_antialias_pallas` — one fused pallas kernel: each grid step
  reads a (T_tile+12, C_tile) input tile (12-sample halo), computes both
  upsample phases, the snake nonlinearity, and the polyphase downsample
  entirely in VMEM, and writes a (T_tile, C_tile) output tile. One HBM
  read + one write instead of ~6 XLA passes. Overlapping tiles are
  materialized by a cheap XLA gather beforehand (halo is ~1% of a tile;
  element-offset BlockSpecs hang the Mosaic compiler on this backend).

Measured on v5e at the stage-4 shape (16, 49152, 96): polyphase-conv
43.6 ms, pallas 48.6 ms (0.90×, Mosaic spends its time on the 24
unaligned sublane slices), with a ~5-min Mosaic compile per shape — so
the pallas kernel is OPT-IN (`use_pallas=True`), kept because it is
bit-accurate where XLA's default conv precision rounds conv inputs to
bf16 (measured up to 6e-2 absolute on intermediate activations;
`jax.default_matmul_precision("highest")` closes that but costs 22%).
A custom VJP routes gradients through the polyphase path so the op
stays trainable either way. Other measured dead ends: channel-
multiplier-2 grouped convs (both phases in one conv) 0.65×; pure
shifted-slice FMA form 0.91× with 5-min compiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kaiser_sinc_filter(cutoff: float, half_width: float, kernel_size: int):
    """Kaiser-windowed sinc low-pass, sum-normalized.
    reference: bigvgan/alias_free_torch/filter.py:28-57."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * np.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


def _phase_filters(k: int = 12):
    """Static polyphase tap lists for ratio-2 Kaiser filters of size k.

    k must be a multiple of 4 (the even/odd phase split below assumes the
    zero-stuffed parity works out; k ≡ 2 mod 4 swaps the phases). With
    q = k//4, the general forms are
        up[2s]   = Σ_a f_up[k-1-2a]·x[clip(s+a-q)]
        up[2s+1] = Σ_a f_up[k-2-2a]·x[clip(s+a-q+1)]
        y[t]     = Σ_a g[2a]·s̃1[t+a-q] + g[2a+1]·s̃0[t+a-q+1]
    (k=12 reproduces the taps documented in snake_antialias_polyphase;
    smaller k trades stop-band attenuation for fewer VPU FLOPs — see
    scripts/perf_bigvgan.py for the measured RTF-vs-SNR curve)."""
    assert k % 4 == 0, f"polyphase split needs k % 4 == 0, got {k}"
    f_up = kaiser_sinc_filter(0.25, 0.3, k) * 2.0
    g = kaiser_sinc_filter(0.25, 0.3, k)
    fr = f_up[::-1]
    f0 = [float(v) for v in fr[0::2]]  # up[2s]   taps: f_up[k-1-2a]
    f1 = [float(v) for v in fr[1::2]]  # up[2s+1] taps: f_up[k-2-2a]
    ge = [float(v) for v in g[0::2]]  # down even taps g[2a]
    go = [float(v) for v in g[1::2]]  # down odd taps g[2a+1]
    return f0, f1, ge, go


def _depthwise_conv(x, filt, stride: int):
    """Depthwise correlate (B, T, C) with a shared 1-D filter."""
    c = x.shape[-1]
    kernel = jnp.tile(jnp.asarray(filt, x.dtype)[:, None, None], (1, 1, c))
    import jax.lax as lax

    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
    )


def snake_antialias_polyphase(x, alpha, inv_beta, kernel_size: int = 12):
    """Pure-XLA polyphase form of up(2×) → snake → down(2×).

    Derivation (matches the reference composition to float tolerance;
    validated in tests/test_bigvgan.py): with k=12-tap filters, edge pad
    P=5, the upsampled signal splits into even/odd phases
        up[2s]   = Σ_a f_up[11-2a]·x[clip(s+a-3)]
        up[2s+1] = Σ_a f_up[10-2a]·x[clip(s+a-2)]
    each a 6-tap VALID depthwise conv over an edge-padded x. The snake
    nonlinearity is elementwise, so it applies per phase. The stride-2
    downsample splits the same way:
        y[t] = Σ_a g[2a]·s̃1[t+a-3] + Σ_a g[2a+1]·s̃0[t+a-2]
    where s̃p are the snaked phases with interleave-aware edge padding
    (left pad = phase-0 first sample, right pad = phase-1 last sample —
    the clip happens on the *interleaved* index).

    kernel_size generalizes both Kaiser filters to k taps (k % 4 == 0,
    offsets q = k//4 — see _phase_filters); k=12 is the reference value.
    """
    k = kernel_size
    q = k // 4
    f0, f1, ge, go = _phase_filters(k)
    t = x.shape[1]
    xe = jnp.concatenate(
        [jnp.repeat(x[:, :1], q, axis=1), x, jnp.repeat(x[:, -1:], q, axis=1)],
        axis=1,
    )
    p0 = _depthwise_conv(xe[:, : t + k // 2 - 1], f0, 1)  # up[2s]
    p1 = _depthwise_conv(xe[:, 1 : t + k // 2], f1, 1)  # up[2s+1]

    s0 = p0 + inv_beta * jnp.sin(p0 * alpha) ** 2
    s1 = p1 + inv_beta * jnp.sin(p1 * alpha) ** 2

    left = jnp.repeat(s0[:, :1], q, axis=1)
    right = jnp.repeat(s1[:, -1:], q, axis=1)
    s0p = jnp.concatenate([left, s0, right], axis=1)
    s1p = jnp.concatenate([left, s1, right], axis=1)

    y = _depthwise_conv(s1p[:, : t + k // 2 - 1], ge, 1)
    return y + _depthwise_conv(s0p[:, 1 : t + k // 2], go, 1)


def _snake_kernel(
    x_ref, a_ref, b_ref, o_ref, *, tt: int, t_total: int, k: int = 12
):
    """One (batch, C-tile, T-tile) grid step, everything in VMEM.

    x_ref: (1, 1, tt+k, Ct) — input tile with k/2-sample halo each side
           (rows are the edge-padded signal X[m]=x[clip(m-k/2)], so the
           upsample's x-side clipping is already baked in).
    o_ref: (1, tt, Ct).
    """
    f0, f1, ge, go = _phase_filters(k)
    q = k // 4
    x = x_ref[0, 0]  # (tt+k, Ct)
    al = a_ref[:]  # (1, Ct)
    ib = b_ref[:]
    nn = tt + k // 2

    # upsample phases over local rows u ∈ [0, tt+k/2), global m = t0-q+u
    p0 = f0[0] * x[0:nn]
    p1 = f1[0] * x[1 : 1 + nn]
    for a in range(1, k // 2):
        p0 = p0 + f0[a] * x[a : a + nn]
        p1 = p1 + f1[a] * x[a + 1 : a + 1 + nn]

    s0 = p0 + ib * jnp.sin(p0 * al) ** 2
    s1 = p1 + ib * jnp.sin(p1 * al) ** 2

    # interleave-aware edge pad: interleaved indices < 0 clip to s0[m=0],
    # ≥ 2T-1 clip to s1[m=T-1] (only first/last tiles have such rows)
    ti = pl.program_id(2)
    m = jax.lax.broadcasted_iota(jnp.int32, (nn, 1), 0) + ti * tt - q
    pad_lo = s0[q : q + 1]  # m = 0 row (first tile only)
    pad_hi = s1[tt + k // 2 - 1 - q : tt + k // 2 - q]  # m = T-1 row
    s0 = jnp.where(m < 0, pad_lo, jnp.where(m >= t_total, pad_hi, s0))
    s1 = jnp.where(m < 0, pad_lo, jnp.where(m >= t_total, pad_hi, s1))

    # downsample: y[t] = Σ_a ge[a]·s̃1[t+a-q] + go[a]·s̃0[t+a-q+1]
    y = ge[0] * s1[0:tt] + go[0] * s0[1 : 1 + tt]
    for a in range(1, k // 2):
        y = y + ge[a] * s1[a : a + tt] + go[a] * s0[a + 1 : a + 1 + tt]
    o_ref[0] = y


def _pick_tiles(t: int, c: int):
    """(t_tile, c_tile) or None if the pallas path doesn't apply."""
    for tt in (2048, 1024, 512, 256):
        if t % tt == 0:
            break
    else:
        return None
    ct = 128 if c % 128 == 0 else c
    if ct > 512:
        return None
    return tt, ct


def snake_antialias_pallas(
    x, alpha, inv_beta, *, kernel_size: int = 12, interpret: bool = False
):
    """Fused anti-aliased snake. x: (B, T, C); alpha/inv_beta: (C,)."""
    b, t, c = x.shape
    k = kernel_size
    tiles = _pick_tiles(t, c)
    assert tiles is not None, f"unsupported shape {(b, t, c)}"
    tt, ct = tiles
    n_t, n_c = t // tt, c // ct

    # edge pad by k/2 (X[m] = x[clip(m-k/2)]) then materialize overlapping
    # tiles with a gather: (B, n_t, tt+k, C). Halo traffic is k/tt ≈ 1%.
    h = k // 2
    xpad = jnp.concatenate(
        [jnp.repeat(x[:, :1], h, axis=1), x, jnp.repeat(x[:, -1:], h, axis=1)],
        axis=1,
    )
    idx = np.arange(n_t)[:, None] * tt + np.arange(tt + k)[None, :]
    x_ov = jnp.take(xpad, jnp.asarray(idx), axis=1)  # (B, n_t, tt+k, C)

    a2 = alpha.reshape(1, c).astype(x.dtype)
    b2 = inv_beta.reshape(1, c).astype(x.dtype)

    kernel = functools.partial(_snake_kernel, tt=tt, t_total=t, k=k)
    return pl.pallas_call(
        kernel,
        grid=(b, n_c, n_t),
        in_specs=[
            pl.BlockSpec(
                (1, 1, tt + k, ct),
                lambda bi, ci, ti: (bi, ti, 0, ci),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, ct), lambda bi, ci, ti: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda bi, ci, ti: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tt, ct),
            lambda bi, ci, ti: (bi, ti, ci),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(x_ov, a2, b2)


def _fold_factor(c: int):
    """Smallest f with f·c a whole number of 128-lane registers (≤ 768)."""
    for lanes in (128, 256, 384, 512, 640, 768):
        if lanes % c == 0:
            return lanes // c
    if c % 128 == 0:
        return 1  # already whole registers (batch-lanes path, wide C)
    return None


# sin²(t) = 0.5 − 0.5·cos(2t), cos(2πv) as a degree-7 polynomial in v²
# after range reduction v = t/π − round(t/π) ∈ [−½, ½]. Max abs error
# 2e-10 in f64, 8.8e-6 evaluated in f32 (range-reduction rounding) —
# ~500× below bf16 output rounding (~4e-3), so the bf16 fold path uses
# it; f32 keeps exact jnp.sin. Why: the r5 profile showed the fold
# custom-calls are VPU-COMPUTE-bound (6.6 ms/call vs a 0.2 ms bandwidth
# ideal, 54% of the whole bf16 generator), and XLA's precise sin is a
# large share of the per-element op count. ~10 VPU ops replace it.
_SIN2_COEF = (
    0.9999999999193508, -19.739208758208584, 64.93939011340913,
    -85.45668538180254, 60.24246470872289, -26.406761080377983,
    7.806608463960106, -1.4609479689305238,
)


# trace-time override for A/Bs and escape hatch: None = auto (poly iff
# bf16 storage), True/False force. See set_snake_fast_sin.
_FAST_SIN_OVERRIDE: bool | None = None

# fold-kernel row-block candidates, largest first (trace-time A/B knob)
_RB_CANDIDATES: tuple = (256, 128, 64, 32, 16, 8)


def set_snake_fast_sin(value: bool | None) -> None:
    """Force (True/False) or restore auto (None) the polynomial sin² in
    the fold kernel. Applies at trace time."""
    global _FAST_SIN_OVERRIDE
    _FAST_SIN_OVERRIDE = value


def _sin2_fast(t):
    """Polynomial sin²(t) (see _SIN2_COEF). Pure mul/round/FMA — lowers
    inside pallas kernels and plain XLA alike."""
    v = t * jnp.float32(1.0 / np.pi)
    v = v - jnp.round(v)
    z = v * v
    c = jnp.float32(_SIN2_COEF[-1])
    for a in _SIN2_COEF[-2::-1]:
        c = c * z + jnp.float32(a)
    return jnp.float32(0.5) - jnp.float32(0.5) * c


def _snake_fold_kernel(
    x_ref, h_ref, a_ref, b_ref, o_ref, *, f, c, lf, hl, rb, k,
    fast_sin=False
):
    """One (batch, row-block) grid step in the folded (T/f, f·C) layout.

    x_ref: (1, rb, lf) — this grid step's ALIGNED body rows, read
           straight from the folded input (no whole-tensor halo copy).
    h_ref: (1, 1, hl+hr, lf) — the gathered halo rows for this block:
           rows [r0-hl, r0) then [r0+rb, r0+rb+hr), clamped at the
           global edges (edge samples are recomputed exactly outside
           the kernel). The halo gather is ~(hl+hr)/rb ≈ 3% of a pass —
           the r4 version gathered body+halo into one overlapping array
           and paid ~2 extra full HBM passes per snake for it.
    Lane l holds channel l % c at fold position l // f... (time shift
    of +s = roll by s // f rows plus a lane roll by (s % f)·c with a
    one-row carry for the lanes that wrap past the fold boundary).
    o_ref: (1, rb, lf).
    """
    q2 = k // 2
    f0, f1, ge, go = _phase_filters(k)
    out_dtype = o_ref.dtype
    # Mosaic's vector rotate is 32-bit only ("Rotate with non-32-bit
    # data" on real v5e for bf16) — and the VPU computes in f32 anyway.
    # bf16 is a storage format here: loads/stores keep the bandwidth
    # win, the in-VMEM working set computes in f32.
    halo = h_ref[0, 0].astype(jnp.float32)  # (hl+hr, lf)
    x = jnp.concatenate(
        [halo[:hl], x_ref[0].astype(jnp.float32), halo[hl:]], axis=0
    )  # (RB_tot, lf)
    al = a_ref[:].astype(jnp.float32)  # (1, lf)
    ib = b_ref[:].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)

    def roll(arr, s, axis):  # backward roll: out[j] = arr[j + s]
        # pltpu.roll wants a non-negative shift; a backward roll by s is a
        # forward roll by dim - s (circular). Wrapped rows land beyond the
        # rb rows we keep (halo sizing guarantees reads stay in-block).
        s %= arr.shape[axis]
        return pltpu.roll(arr, arr.shape[axis] - s, axis) if s else arr

    def tshift(arr, s):  # arr at folded time j -> arr at time j + s
        b0, a1 = divmod(s, f)
        d = roll(arr, b0, 0)
        if a1 == 0:
            return d
        e = roll(arr, b0 + 1, 0)
        g1 = roll(d, a1 * c, 1)
        g2 = roll(e, a1 * c, 1)
        return jnp.where(lane < lf - a1 * c, g1, g2)

    # local X[j] = x[Tbase + j]; P0[j] = p0[Tbase + j + k/4],
    # P1[j] = p1[Tbase + j + k/4 - 1] (same shifted reads, both phases)
    xs = [tshift(x, a) for a in range(q2)]
    p0 = sum(f0[a] * xs[a] for a in range(q2))
    p1 = sum(f1[a] * xs[a] for a in range(q2))
    sin2 = _sin2_fast if fast_sin else (lambda t: jnp.sin(t) ** 2)
    s0 = p0 + ib * sin2(p0 * al)
    s1 = p1 + ib * sin2(p1 * al)

    # y[t] = Σ_a ge[a]·s1[t+a-k/4] + go[a]·s0[t+a-k/4+1]; with the S
    # alignments above both terms land at the same local offset.
    # Horner form (r5): 2 base shifts + (q2-1) accumulator shifts = 7
    # whole-block tshifts instead of the naive 2·q2 = 12 — the kernel is
    # VPU-bound and tshifts are its dominant op. Same sums, reassociated
    # (float-tolerance identical; covered by the f64-oracle receipt).
    base = hl * f - (q2 - 1)
    s1b = tshift(s1, base)
    s0b = tshift(s0, base)
    y = ge[q2 - 1] * s1b + go[q2 - 1] * s0b
    for a in range(q2 - 2, -1, -1):
        y = tshift(y, 1) + ge[a] * s1b + go[a] * s0b
    o_ref[0] = y[:rb].astype(out_dtype)


def snake_antialias_fold(
    x,
    alpha,
    inv_beta,
    *,
    kernel_size: int = 12,
    interpret: bool = False,
    fast_sin: bool | None = None,
):
    """Fused anti-aliased snake in the folded full-lane layout.

    (B, T, C) is viewed as (B, T/f, f·C) — a free reshape of contiguous
    NWC memory — so every vector register is fully occupied even at the
    narrow late BigVGAN stages (C=24 → 16·24=384 lanes vs 24/128 used by
    the NWC polyphase convs). The whole up→snake→down chain then runs in
    one pallas kernel (one HBM read + one write + a ~1% halo gather)
    with all FIR taps as forward rolls. Global edge samples (where the
    reference clips on the interleaved signal —
    bigvgan/alias_free_torch/resample.py:10-48) are recomputed exactly
    by the polyphase path on two tiny slices and spliced in.
    """
    b, t, c = x.shape
    k = kernel_size
    f = _fold_factor(c)
    assert f is not None and t % f == 0, (t, c)
    rows = t // f
    lf = f * c
    for rb in _RB_CANDIDATES:
        # VMEM-aware: in-block + halo + out-block, double-buffered by the
        # grid pipeline, plus the kernel's f32 working set — keep the
        # per-program block footprint well under the ~16 MB VMEM
        if rows % rb == 0 and rows >= rb and rb * lf * 4 <= 1_500_000:
            break
    else:
        raise ValueError(f"rows {rows} not tileable for lf {lf}")
    q2 = k // 2
    hl = max(1, -(-(q2 - 1) // f))
    hr = hl + -(-q2 // f) + 1
    rb_tot = rb + hl + hr
    nblk = rows // rb

    xf = x.reshape(b, rows, lf)
    # gather ONLY the halo rows per block (~(hl+hr)/rb ≈ 3% of a pass);
    # the body rows stream into the kernel as aligned BlockSpec blocks
    # straight from xf. (The r4 version gathered body+halo into one
    # overlapping (B, nblk, RB_tot, lf) array — ~2 extra full HBM
    # passes per snake.)
    halo_idx = np.concatenate(
        [
            np.arange(nblk)[:, None] * rb + np.arange(-hl, 0)[None, :],
            np.arange(nblk)[:, None] * rb + rb + np.arange(hr)[None, :],
        ],
        axis=1,
    ).clip(0, rows - 1)
    x_halo = jnp.take(xf, jnp.asarray(halo_idx), axis=1)

    af = jnp.tile(jnp.asarray(alpha, x.dtype), f).reshape(1, lf)
    bf = jnp.tile(jnp.asarray(inv_beta, x.dtype), f).reshape(1, lf)

    if fast_sin is None:
        if _FAST_SIN_OVERRIDE is not None:
            fast_sin = _FAST_SIN_OVERRIDE
        else:
            # poly sin² only where its ≤1e-5 deviation vanishes under
            # the output rounding; f32 keeps exact sin (parity path)
            fast_sin = x.dtype == jnp.bfloat16
    kernel = functools.partial(
        _snake_fold_kernel, f=f, c=c, lf=lf, hl=hl, rb=rb, k=k,
        fast_sin=fast_sin,
    )
    y = pl.pallas_call(
        kernel,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec(
                (1, rb, lf),
                lambda bi, ni: (bi, ni, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hl + hr, lf),
                lambda bi, ni: (bi, ni, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, lf), lambda bi, ni: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lf), lambda bi, ni: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rb, lf), lambda bi, ni: (bi, ni, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows, lf), x.dtype),
        interpret=interpret,
    )(xf, x_halo, af, bf).reshape(b, t, c)

    # exact edges: the kernel's clamped halo rows stand in for the
    # reference's interleave-aware clipping only approximately
    n_edge = max(k + max(hl, hr) * f, 16)
    m = n_edge + 2 * k
    yl = snake_antialias_polyphase(x[:, :m], alpha, inv_beta, k)[:, :n_edge]
    yr = snake_antialias_polyphase(x[:, -m:], alpha, inv_beta, k)[:, -n_edge:]
    y = y.at[:, :n_edge].set(yl).at[:, -n_edge:].set(yr)
    return y


def snake_antialias_fold_batchlanes(
    x,
    alpha,
    inv_beta,
    *,
    kernel_size: int = 12,
    interpret: bool = False,
    fast_sin: bool | None = None,
):
    """Batch-in-lanes orientation of the fold kernel (r5).

    The r5 generator profile showed ~2.4 ms {2,0,1}→{2,1,0} layout
    copies on BOTH sides of every fold custom-call: XLA lays the
    neighboring conv fusions out time-major with batch interleaved
    (minor-to-major {C, B, T}), while the fold path needs row-major
    (B, T, C) memory to fold time into lanes. But that producer layout
    IS a (T, B·C) row-major array: one row per time sample, all batch
    items × channels in the lanes (B·C = 384+ → full registers at every
    stage). Viewing it that way, (1) the boundary transposes become
    bitcasts, and (2) every FIR tap in the kernel is a pure ROW shift —
    the f=1 case of `_snake_fold_kernel`, with no lane rolls at all.

    Implemented as a pure re-orientation: transpose+reshape to
    (1, T, B·C), tile alpha/inv_beta per batch item, and call
    `snake_antialias_fold` (which picks f=1 since B·C ≡ 0 mod 128).
    Identical math; the edge splice inside runs the polyphase form on
    the same re-oriented array (per-channel math is unchanged).

    **Measured: a NET LOSS (kept opt-in via snake_impl="foldb").**
    Whole generator on v5e 2026-08-20 (roofline_bigvgan --variants
    bf16_fold,bf16_foldb, interleaved): fold 887.6 ms / 261.8 GB
    accessed vs foldb 1106.0 ms / 363.7 GB. XLA does NOT cancel the
    explicit transposes against its {2,0,1} layout choice — the
    custom-call pins {2,1,0} on the re-oriented operand and the
    transposes materialize, costing more than the boundary copies they
    were meant to remove. Eliminating those copies needs custom-call
    operand-layout control, which pallas does not expose today."""
    b, t, c = x.shape
    xt = jnp.transpose(x, (1, 0, 2)).reshape(1, t, b * c)
    al = jnp.tile(
        jnp.broadcast_to(jnp.asarray(alpha, x.dtype), (c,)), b
    )
    ib = jnp.tile(
        jnp.broadcast_to(jnp.asarray(inv_beta, x.dtype), (c,)), b
    )
    y = snake_antialias_fold(
        xt, al, ib, kernel_size=kernel_size, interpret=interpret,
        fast_sin=fast_sin,
    )
    return jnp.transpose(y.reshape(t, b, c), (1, 0, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _snake_fold_op(x, alpha, inv_beta, kernel_size=12):
    return snake_antialias_fold(x, alpha, inv_beta, kernel_size=kernel_size)


def _snake_fold_fwd(x, alpha, inv_beta, kernel_size):
    return (
        _snake_fold_op(x, alpha, inv_beta, kernel_size),
        (x, alpha, inv_beta),
    )


_snake_fold_op.defvjp(_snake_fold_fwd, lambda k, res, g: _snake_bwd(k, res, g))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _snake_foldb_op(x, alpha, inv_beta, kernel_size=12):
    return snake_antialias_fold_batchlanes(
        x, alpha, inv_beta, kernel_size=kernel_size
    )


def _snake_foldb_fwd(x, alpha, inv_beta, kernel_size):
    return (
        _snake_foldb_op(x, alpha, inv_beta, kernel_size),
        (x, alpha, inv_beta),
    )


_snake_foldb_op.defvjp(
    _snake_foldb_fwd, lambda k, res, g: _snake_bwd(k, res, g)
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _snake_pallas_op(x, alpha, inv_beta, kernel_size=12):
    return snake_antialias_pallas(x, alpha, inv_beta, kernel_size=kernel_size)


def _snake_fwd(x, alpha, inv_beta, kernel_size):
    return (
        _snake_pallas_op(x, alpha, inv_beta, kernel_size),
        (x, alpha, inv_beta),
    )


def _snake_bwd(kernel_size, res, g):
    # gradients via the (numerically identical) XLA polyphase path —
    # vocoder training is off the synthesis hot path
    x, alpha, inv_beta = res
    _, vjp = jax.vjp(
        lambda a, b, c: snake_antialias_polyphase(a, b, c, kernel_size),
        x, alpha, inv_beta,
    )
    return vjp(g)


_snake_pallas_op.defvjp(_snake_fwd, _snake_bwd)


def _fold_ok(t: int, c: int, kernel_size: int = 12) -> bool:
    f = _fold_factor(c)
    k = kernel_size
    # edge fixup needs n_edge = max(k + f, 16) clean samples per side plus
    # 2k of polyphase context (see snake_antialias_fold's edge slices)
    return (
        f is not None
        and t % f == 0
        and (t // f) % 8 == 0
        and t // f >= 8
        and t >= 2 * (max(k + f, 16) + 2 * k)
    )


def snake_antialias(
    x,
    alpha,
    inv_beta,
    use_pallas: bool = False,
    kernel_size: int = 12,
    impl: str | None = None,
):
    """2× anti-aliased snake. x: (B, T, C); alpha/inv_beta broadcastable
    (C,). impl selects the lowering (falls back to polyphase off-TPU or
    on unsupported shapes):
      - "auto" — fold for bf16 on TPU, polyphase otherwise. Measured on
        v5e (scripts/perf_bigvgan.py, 2026-08-19, whole generator,
        interleaved medians): fold_bf16 1259 ms vs XLA bf16 1380 vs f32
        1513 (1.20x, the fastest variant) but fold_f32 1605 (0.94x —
        XLA fuses the f32 polyphase chain into neighboring convs; a
        pallas call is a fusion barrier, and in f32 that loses more
        than the full-lane layout gains).
      - "polyphase" — pure-XLA NWC depthwise convs (works everywhere).
      - "fold" — fused pallas kernel in the folded full-lane layout
        (see snake_antialias_fold): one HBM round trip regardless of C.
      - "pallas" — fused NWC-layout pallas kernel (bit-accurate where
        XLA default-precision convs round inputs to bf16, but ~0.9x and
        minutes of Mosaic compile; `use_pallas=True` is the legacy alias).
    kernel_size sets both Kaiser filters' tap count (k % 4 == 0; 12 is
    the reference value, 8 trades ~7.9 dB whole-generator SNR for ~1%
    RTF — measured in scripts/perf_bigvgan.py, not worth it)."""
    if impl is None:
        impl = "pallas" if use_pallas else "polyphase"
    on_tpu = jax.default_backend() == "tpu"
    if impl == "auto":
        impl = "fold" if x.dtype == jnp.bfloat16 else "polyphase"
    if impl == "foldb":
        # batch-in-lanes fold: needs B·C ≡ 0 mod 128 rows of full lanes
        b_, t_, c_ = x.shape
        if on_tpu and (b_ * c_) % 128 == 0 and _fold_ok(t_, b_ * c_,
                                                        kernel_size):
            alpha = jnp.broadcast_to(
                jnp.asarray(alpha, x.dtype), (c_,)
            )
            inv_beta = jnp.broadcast_to(
                jnp.asarray(inv_beta, x.dtype), (c_,)
            )
            return _snake_foldb_op(x, alpha, inv_beta, kernel_size)
        impl = "fold"  # fall through to the standard fold / polyphase
    if impl == "fold" and on_tpu and _fold_ok(
        x.shape[1], x.shape[2], kernel_size
    ):
        alpha = jnp.broadcast_to(jnp.asarray(alpha, x.dtype), (x.shape[-1],))
        inv_beta = jnp.broadcast_to(
            jnp.asarray(inv_beta, x.dtype), (x.shape[-1],)
        )
        return _snake_fold_op(x, alpha, inv_beta, kernel_size)
    if impl == "pallas" and on_tpu and _pick_tiles(x.shape[1], x.shape[2]):
        alpha = jnp.broadcast_to(jnp.asarray(alpha, x.dtype), (x.shape[-1],))
        inv_beta = jnp.broadcast_to(jnp.asarray(inv_beta, x.dtype), (x.shape[-1],))
        return _snake_pallas_op(x, alpha, inv_beta, kernel_size)
    return snake_antialias_polyphase(x, alpha, inv_beta, kernel_size)
