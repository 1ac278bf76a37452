"""Monotonic alignment search (MAS), fully on-device.

The reference implements MAS as a Cython/OpenMP CPU kernel and round-trips
GPU→numpy→GPU every training step
(reference: DEX-TTS/model/monotonic_align/core.pyx:9-45,
 DEX-TTS/model/monotonic_align/__init__.py:8-23).

Two on-device implementations of the same Viterbi DP:

`maximum_path_scan` — two `lax.scan`s over mel frames:
  forward  — one scan step per frame y updates the whole (B, Tx) value
             column with VPU-vectorized max/adds (the anti-diagonal band is
             enforced with masks rather than loop bounds),
  backtrace — a reverse scan carries the per-item token index and emits
             one-hot path columns.

`maximum_path_pallas` — the whole DP in ONE pallas kernel: the value
matrix lives in VMEM for the entire forward recursion (`fori_loop` over
frames, no per-step HBM traffic or XLA loop overhead), the forward pass
additionally records one "diagonal-beats-stay" bit per cell, and the
backtrace replays those bits with a one-hot token vector (dot products
instead of per-item gathers). Batch is vectorized across VPU sublanes;
the grid splits the batch only when the (Ty, Bb, Tx) blocks would not
fit VMEM. Measured on v5e (scripts/perf_mas.py, CLAUDE.md): standalone
~13 ms scan vs ~10 ms pallas net of dispatch; inside the full train step
the two are indistinguishable (MAS is ~2 ms of a ~200 ms step) — the
kernel's value is removing the XLA scan-loop overhead and per-step HBM
traffic, not an order-of-magnitude win at these shapes.

`maximum_path` dispatches to the SCAN form by default (override with
`set_mas_backend("pallas")`). Two reasons, both measured:

1. `pallas_call` carries no GSPMD partitioning rule — under a dp-sharded
   train step XLA would have to replicate the custom call (all-gathering
   the whole (B, Tx, Ty) prior per chip) or fail to partition it; the
   scan form partitions cleanly.
2. **Memory-corruption under large grids on the v5e remote backend**
   (2026-08-19, root cause of the bench_train batch-128 dur_loss
   blow-up, VERDICT r3 item 2): at batch 128 (grid 8) with the train
   graph's mixed-dtype producers (f32 log-prior × bf16 mask), the
   kernel's operands/outputs corrupt silently — all-zero paths → zero
   durations → dur_loss ≈ (log 1e-8)² ≈ 339. Standalone uniform-f32
   calls are bit-exact at every batch size tested (32/64/128), plain
   XLA handles the identical mixed-dtype expressions correctly, and in
   one compilation the corruption clobbered the *scan* twin's output in
   the same jit — i.e. a backend codegen/DMA bug around the custom
   call, not a kernel-logic bug (the kernel never indexes outside its
   blocks). Repro receipts: scripts/debug_b128.py --full, the A/B in
   docs/TRAINING.md. Since MAS is train-only (inference uses
   generate_path) and the in-step pallas-vs-scan A/B is 1.000x (MAS is
   ~2 ms of a ~200 ms step), the scan default costs nothing.

Both forms match the Cython kernel's recurrence exactly on all cells a
valid path can visit, and keep alignment on the TPU (no host sync).
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9

# None = auto (pallas on TPU, scan otherwise); "scan" | "pallas" force one
_BACKEND: str | None = None

# Runtime invariant check on the opt-in pallas path (see MASPathError).
_GUARD: bool = True


class MASPathError(RuntimeError):
    """The MAS path violated its structural invariant at runtime.

    A valid monotonic alignment emits exactly one token per active mel
    frame, so per item `sum(path) == t_y` (the masked frame count). The
    known failure mode this guards is the v5e remote-backend custom-call
    corruption (all-zero paths at batch-128 grids with mixed-dtype
    producers — docs/TRAINING.md post-mortem): training would otherwise
    proceed silently on zero alignments with dur_loss ≈ (log 1e-8)² ≈ 339.
    """


def set_mas_backend(backend: str | None) -> None:
    """Force the MAS implementation ("scan" | "pallas") or restore auto
    dispatch (None). Applies at trace time — call before jit compiles.

    Opting into "pallas" warns: the kernel has a known silent-corruption
    mode inside mixed-dtype train graphs on the v5e remote backend
    (docs/TRAINING.md). The dispatcher therefore wraps the pallas path in
    a runtime invariant check (`check_mas_path`) that raises MASPathError
    instead of letting training continue on all-zero alignments; disable
    only with `set_mas_guard(False)`.
    """
    global _BACKEND
    assert backend in (None, "scan", "pallas"), backend
    if backend == "pallas":
        warnings.warn(
            "set_mas_backend('pallas'): the pallas MAS kernel has a known "
            "SILENT-corruption mode at large batch grids with mixed-dtype "
            "producers on the v5e remote backend (all-zero alignment "
            "paths; see docs/TRAINING.md). A runtime invariant guard is "
            "active and will raise MASPathError if a corrupt path is "
            "produced; the scan backend (default) has no such failure "
            "mode and is equally fast in-step.",
            stacklevel=2,
        )
    _BACKEND = backend


def set_mas_guard(enabled: bool) -> None:
    """Enable/disable the runtime path-invariant guard on the opt-in
    pallas dispatcher path (default: enabled). Trace-time switch."""
    global _GUARD
    _GUARD = bool(enabled)


def _raise_on_bad_path(got: jnp.ndarray, want: jnp.ndarray) -> None:
    import numpy as np

    got = np.asarray(got)
    want = np.asarray(want)
    if not np.array_equal(got, want):
        bad = np.nonzero(got != want)[0]
        raise MASPathError(
            "MAS path invariant violated: per-item path frame counts "
            f"{got[bad][:8].tolist()} != masked frame counts "
            f"{want[bad][:8].tolist()} for batch items {bad[:8].tolist()} "
            f"({bad.size}/{got.size} items corrupt). This is the known "
            "pallas-MAS custom-call corruption on this backend — use the "
            "scan backend (set_mas_backend(None) or 'scan'); see "
            "docs/TRAINING.md."
        )


def check_mas_path(path: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Attach a runtime invariant check to `path`: every active frame
    emits exactly one token, i.e. per item `sum(path) == t_y`. Raises
    MASPathError (from inside the compiled step, via debug callback) on
    violation; returns `path` unchanged. Cost: one (B,) reduction + a
    few-byte async host transfer per step."""
    got = jnp.round(
        jnp.sum(path.astype(jnp.float32), axis=(1, 2))
    ).astype(jnp.int32)
    want = jnp.round(
        jnp.sum(mask[:, 0, :].astype(jnp.float32), axis=1)
    ).astype(jnp.int32)
    if isinstance(got, jax.core.Tracer) or isinstance(want, jax.core.Tracer):
        jax.debug.callback(_raise_on_bad_path, got, want)
    else:
        _raise_on_bad_path(got, want)  # eager: raise MASPathError directly
    return path


def maximum_path(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Most-likely monotonic alignment path (backend dispatcher).

    pallas kernel on TPU, lax.scan elsewhere; see module docstring.
    """
    backend = _BACKEND
    if backend is None:
        # scan by default: partitions under GSPMD, and the pallas kernel
        # corrupts memory at large batch grids on the v5e remote backend
        # (module docstring point 2) while being 1.000x in-step anyway
        backend = "scan"
    if backend == "pallas":
        path = maximum_path_pallas(value, mask)
        if _GUARD:
            path = check_mas_path(path, mask)
        return path
    return maximum_path_scan(value, mask)


def maximum_path_scan(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Most-likely monotonic alignment path.

    Args:
      value: (B, Tx, Ty) log-prior scores (higher = better).
      mask:  (B, Tx, Ty) binary attention mask (outer product of the text
             and mel masks).

    Returns:
      (B, Tx, Ty) 0/1 float path, same semantics as the reference wrapper
      (reference: DEX-TTS/model/monotonic_align/__init__.py:8-23).
    """
    b, t_x_max, t_y_max = value.shape
    dtype = value.dtype
    value = value * mask
    t_xs = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)  # (B,)
    t_ys = jnp.sum(mask[:, 0, :], axis=1).astype(jnp.int32)  # (B,)

    x_ids = jnp.arange(t_x_max, dtype=jnp.int32)  # (Tx,)

    # ---- forward DP: scan over frames y ----
    # carry: previous column of accumulated values, (B, Tx)
    def fwd_step(prev, inputs):
        y, col = inputs  # y scalar, col (B, Tx) raw scores at frame y
        # v_cur: stay on the same token (invalid on the diagonal x == y)
        v_cur = jnp.where(x_ids[None, :] == y, _NEG, prev)
        # v_prev: advance from token x-1 (x == 0 starts at 0 iff y == 0)
        shifted = jnp.pad(prev, ((0, 0), (1, 0)), constant_values=_NEG)[:, :-1]
        first = jnp.where(y == 0, jnp.asarray(0.0, dtype), jnp.asarray(_NEG, dtype))
        v_prev = jnp.where(x_ids[None, :] == 0, first, shifted)
        cand = col + jnp.maximum(v_cur, v_prev)
        # valid band: x <= y, x >= t_x + y - t_y, x < t_x, y < t_y
        valid = (
            (x_ids[None, :] <= y)
            & (x_ids[None, :] >= t_xs[:, None] + y - t_ys[:, None])
            & (x_ids[None, :] < t_xs[:, None])
            & (y < t_ys[:, None])
        )
        new = jnp.where(valid, cand, _NEG)
        return new, new

    cols = jnp.moveaxis(value, 2, 0)  # (Ty, B, Tx)
    ys = jnp.arange(t_y_max, dtype=jnp.int32)
    init = jnp.full((b, t_x_max), _NEG, dtype)
    _, acc = jax.lax.scan(fwd_step, init, (ys, cols))  # acc: (Ty, B, Tx)

    # ---- backtrace: reverse scan carrying the current token index ----
    # at step y we need the accumulated column y-1
    acc_prev = jnp.concatenate([jnp.full((1, b, t_x_max), _NEG, dtype), acc[:-1]], 0)
    batch_ids = jnp.arange(b)

    def bwd_step(index, inputs):
        y, col_prev = inputs  # col_prev: accumulated values at frame y-1
        active = y < t_ys  # (B,)
        emit = (x_ids[None, :] == index[:, None]) & active[:, None]
        v_here = col_prev[batch_ids, index]
        v_diag = col_prev[batch_ids, jnp.maximum(index - 1, 0)]
        move = (index != 0) & ((index == y) | (v_here < v_diag))
        new_index = jnp.where(active & move, index - 1, index)
        return new_index, emit

    init_index = t_xs - 1
    _, path_cols = jax.lax.scan(
        bwd_step, init_index, (ys, acc_prev), reverse=True
    )  # (Ty, B, Tx), emitted in forward order
    path = jnp.moveaxis(path_cols, 0, 2).astype(dtype)  # (B, Tx, Ty)
    return path * mask


def _mas_kernel(txs_ref, tys_ref, vt_ref, path_ref, bits_ref):
    """One batch-block of the full MAS DP, entirely in VMEM.

    vt_ref:   (Ty, Bb, Tx) masked log-prior, frame-major so each loop
              step touches one contiguous (Bb, Tx) tile.
    bits_ref: (Ty, Bb, Tx) f32 scratch; bits[y, b, x] = 1 iff
              acc[y-1, b, x-1] > acc[y-1, b, x] (take the diagonal).
    path_ref: (Ty, Bb, Tx) f32 one-hot output columns.
    """
    t_y_max, bb, t_x_max = vt_ref.shape
    x_ids = jax.lax.broadcasted_iota(jnp.int32, (bb, t_x_max), 1)
    txs = txs_ref[:]  # (Bb, 1) int32
    tys = tys_ref[:]
    neg = jnp.float32(_NEG)

    # ---- forward DP over frames; carry = previous accumulated column ----
    def fwd(y, prev):
        col = vt_ref[y]
        v_cur = jnp.where(x_ids == y, neg, prev)
        shifted = jnp.concatenate(
            [jnp.full((bb, 1), neg), prev[:, :-1]], axis=1
        )
        # move-bit for the backtrace: diagonal predecessor beats staying
        bits_ref[y] = (shifted > prev).astype(jnp.float32)
        first = jnp.where(y == 0, jnp.float32(0.0), neg)
        v_prev = jnp.where(x_ids == 0, first, shifted)
        cand = col + jnp.maximum(v_cur, v_prev)
        valid = (
            (x_ids <= y)
            & (x_ids >= txs + y - tys)
            & (x_ids < txs)
            & (y < tys)
        )
        return jnp.where(valid, cand, neg)

    init = jnp.full((bb, t_x_max), neg, jnp.float32)
    jax.lax.fori_loop(0, t_y_max, fwd, init)

    # ---- backtrace: one-hot token vector instead of per-item gathers ----
    onehot0 = (x_ids == txs - 1).astype(jnp.float32)  # (Bb, Tx)

    def bwd(i, onehot):
        y = t_y_max - 1 - i
        active = y < tys  # (Bb, 1) bool
        emit = onehot * active.astype(jnp.float32)
        path_ref[y] = emit
        take_diag = (
            jnp.sum(onehot * bits_ref[y], axis=1, keepdims=True) > 0
        )
        index_is_y = (
            jnp.sum(onehot * (x_ids == y).astype(jnp.float32),
                    axis=1, keepdims=True) > 0
        )
        index_is_0 = onehot[:, 0:1] > 0
        move = (~index_is_0) & (index_is_y | take_diag) & active
        stepped = jnp.concatenate(
            [onehot[:, 1:], jnp.zeros((bb, 1), jnp.float32)], axis=1
        )
        return jnp.where(move, stepped, onehot)

    jax.lax.fori_loop(0, t_y_max, bwd, onehot0)


_VMEM_BUDGET_ELEMS = 10 * 1024 * 1024 // 4


def _pick_batch_block(b: int, t_x: int, t_y: int) -> int:
    """Largest batch block whose VMEM footprint stays under budget.

    Live per-program buffers: vt + path (double-buffered by the grid
    pipeline) + bits scratch ≈ 5 × (Ty·Bb·Tx) f32. Budget ~10 MB of the
    ~16 MB VMEM. At bb=1 the footprint may STILL exceed the budget for
    pathologically long buckets (e.g. Tx 512 × Ty 2048 ≈ 20 MB) — callers
    must check `_fits_vmem` and fall back to the scan form rather than
    compile a kernel that cannot fit.
    """
    bb = b
    while bb > 1 and (5 * t_y * bb * t_x > _VMEM_BUDGET_ELEMS or b % bb):
        bb -= 1
    return bb


def _fits_vmem(bb: int, t_x: int, t_y: int) -> bool:
    return 5 * t_y * bb * t_x <= _VMEM_BUDGET_ELEMS


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(
    value: jnp.ndarray, mask: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """MAS as one pallas kernel (see module docstring). Same contract as
    `maximum_path_scan`; `interpret=True` runs the kernel in interpreter
    mode for CPU tests. Shapes whose bb=1 working set still exceeds the
    VMEM budget dispatch to `maximum_path_scan` instead of compiling a
    kernel that cannot fit."""
    b, t_x_max, t_y_max = value.shape
    if not _fits_vmem(1, t_x_max, t_y_max):
        return maximum_path_scan(value, mask)
    dtype = value.dtype
    # Uniform-dtype operands + a fusion barrier before the custom call.
    # Measured (v5e, 2026-08-19, /tmp/mas_dtype_check.py → regression test
    # tests/test_ops.py::test_mas_pallas_mixed_dtype_large_batch): with a
    # MIXED-dtype producer (value f32 × mask bf16 — exactly what
    # compute_loss feeds under compute_dtype=bfloat16) the fused
    # convert+multiply+transpose XLA builds for the pallas operand
    # silently corrupts the kernel's input from b≈128 up (all 128 items'
    # paths wrong → zero durations → the bench_train b128 dur_loss
    # blow-up, VERDICT r3 item 2), while uniform f32×f32 or bf16×bf16
    # producers are exact at every size. Casting both operands to f32
    # first and barriering vt keeps the custom-call operand a plain
    # default-layout buffer instead of a mixed-dtype fusion output.
    mask_f = mask.astype(jnp.float32)
    value_f = value.astype(jnp.float32)
    t_xs = jnp.sum(mask_f[:, :, 0], axis=1).astype(jnp.int32)[:, None]
    t_ys = jnp.sum(mask_f[:, 0, :], axis=1).astype(jnp.int32)[:, None]
    vt = jax.lax.optimization_barrier(
        jnp.moveaxis(value_f * mask_f, 2, 0)
    )

    bb = _pick_batch_block(b, t_x_max, t_y_max)
    grid = (b // bb,)
    path_t = pl.pallas_call(
        _mas_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, 1), lambda i: (i, 0)),
            pl.BlockSpec((bb, 1), lambda i: (i, 0)),
            pl.BlockSpec((t_y_max, bb, t_x_max), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((t_y_max, bb, t_x_max), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((t_y_max, b, t_x_max), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_y_max, bb, t_x_max), jnp.float32)
        ],
        interpret=interpret,
    )(t_xs, t_ys, vt)
    path = jnp.moveaxis(path_t, 0, 2).astype(dtype)
    return path * mask
