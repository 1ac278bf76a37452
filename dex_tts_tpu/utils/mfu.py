"""Model-FLOPs-utilization accounting for the bench artifacts.

MFU = (analytical graph FLOPs) / (measured wall-clock) / (chip peak
FLOP/s) — the standard "how close to the hardware ceiling is this
program" number (the reference has no equivalent; it reports no
throughput accounting at all).

Two measured XLA facts shape the implementation (verified on this
machine, see tests/test_utils_extra.py):

1. `Compiled.cost_analysis()` counts a `lax.scan`/while-loop body ONCE,
   regardless of trip count — a 50-step sampler graph would undercount
   ~50x. Callers must therefore count FLOPs on a graph whose loops are
   fully unrolled (`SamplerConfig(unroll=num_steps)` for the sampler;
   the rolled and unrolled graphs execute the same math).
2. `Lowered.cost_analysis()` (BEFORE backend compilation) prices the
   same HLO in milliseconds even for a fully-unrolled 50-step graph —
   no multi-minute XLA compile is spent on a graph we never run.
   Unoptimized-HLO flops can differ slightly from the optimized
   executable (DCE, algebraic simplification), which is fine for a
   utilization metric.

Peaks are dense bf16 matmul peaks per chip (public TPU specs). f32 ops
are counted against the same peak, making reported MFU conservative
(a lower bound) for f32/mixed graphs.
"""

from __future__ import annotations

import jax

# (device_kind substring, dense bf16 peak FLOP/s per chip).
# Order matters: more specific kinds first ("v5 lite" before "v5").
_PEAKS: tuple[tuple[str, float], ...] = (
    ("v5 lite", 197e12),   # v5e
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v5", 459e12),
    ("v6 lite", 918e12),   # Trillium / v6e
    ("v6e", 918e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def peak_flops_per_chip() -> float | None:
    """Dense bf16 peak FLOP/s of one local chip; None off-TPU (a CPU MFU
    number would be fiction — no stable peak to normalize against)."""
    if jax.default_backend() != "tpu":
        return None
    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in _PEAKS:
        if sub in kind:
            return peak
    return None


def _flops_of(cost_analysis_fn) -> float | None:
    try:
        ca = cost_analysis_fn()
    except Exception:
        return None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = (ca or {}).get("flops")
    if flops is None or flops <= 0:
        return None
    return float(flops)


def lowered_flops(
    jitted_fn, *args, compile_fallback: bool = False, **kwargs
) -> float | None:
    """Analytical FLOPs of `jitted_fn(*args)` from unoptimized-HLO cost
    analysis (no backend compile). None when the backend/jaxlib does not
    expose a flops estimate. See module docstring for the scan caveat —
    pass a fully-unrolled twin of any looped graph.

    compile_fallback: the axon remote-TPU backend exposes no pre-compile
    cost analysis (measured: Lowered.cost_analysis() is empty there while
    Compiled.cost_analysis() works, cf. scripts/roofline_bigvgan.py).
    When set, fall back to compiling the twin (~1-2 min on the tunnel) —
    post-optimization flops, equally valid for a utilization metric."""
    try:
        lowered = jitted_fn.lower(*args, **kwargs)
    except Exception:
        return None
    flops = _flops_of(lowered.cost_analysis)
    if flops is None and compile_fallback:
        flops = _flops_of(lambda: lowered.compile().cost_analysis())
    return flops


def extrapolated_scan_flops(
    jit_fn_at_unroll, steps: int, *args, compile_fallback: bool = False,
    **kwargs
) -> float | None:
    """Total FLOPs of a graph whose single loop scans `steps` iterations,
    WITHOUT tracing `steps` body copies (full unroll of a 50-step
    full-model sampler costs minutes of host tracing).

    `jit_fn_at_unroll(u)` must return a jitted twin whose scan uses
    unroll=u. Lowered cost analysis prices the loop body once per unroll
    copy, so F(u) = A + u·B with A = non-loop flops, B = per-iteration
    flops — two cheap lowerings (u=1, 2) give
    total = A + steps·B = F(1) + (steps−1)·(F(2)−F(1))."""
    f1 = lowered_flops(
        jit_fn_at_unroll(1), *args, compile_fallback=compile_fallback,
        **kwargs,
    )
    f2 = lowered_flops(
        jit_fn_at_unroll(2), *args, compile_fallback=compile_fallback,
        **kwargs,
    )
    if f1 is None or f2 is None or f2 <= f1:
        return None
    return f1 + (steps - 1) * (f2 - f1)


def mfu(flops: float | None, wall_seconds: float) -> float | None:
    """Fraction of the chip's bf16 peak this dispatch achieved."""
    peak = peak_flops_per_chip()
    if flops is None or peak is None or wall_seconds <= 0:
        return None
    return flops / wall_seconds / peak
