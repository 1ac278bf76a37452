"""TPU: isolate MAS cost and compare implementation variants.

The round-2 train decomposition (scripts/profile_train.py) showed MAS ≈
33% of the DeX train step at (B=32, Tx=96, Ty=256). This script times
the standalone `maximum_path` and attributes the cost: forward scan
only, backtrace only, scan `unroll`, and a gather-free one-hot
backtrace. Informs the pallas wavefront kernel (SURVEY §7 hard part 1).

Run: python scripts/perf_mas.py [--batch 32] [--tx 96] [--ty 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.ops import mas


def timed(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    return dt


def make_inputs(b, tx, ty, seed=0):
    rng = np.random.default_rng(seed)
    value = rng.standard_normal((b, tx, ty)).astype(np.float32)
    t_xs = rng.integers(tx // 2, tx + 1, (b,))
    t_ys = rng.integers(ty // 2, ty + 1, (b,))
    # MAS requires t_x <= t_y
    t_xs = np.minimum(t_xs, t_ys)
    x_mask = (np.arange(tx)[None] < t_xs[:, None]).astype(np.float32)
    y_mask = (np.arange(ty)[None] < t_ys[:, None]).astype(np.float32)
    mask = x_mask[:, :, None] * y_mask[:, None, :]
    return jnp.asarray(value), jnp.asarray(mask)


def forward_only(value, mask):
    """The forward DP scan alone (no backtrace) — lower bound for the
    scan-based design."""
    b, t_x_max, t_y_max = value.shape
    dtype = value.dtype
    value = value * mask
    t_xs = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)
    t_ys = jnp.sum(mask[:, 0, :], axis=1).astype(jnp.int32)
    x_ids = jnp.arange(t_x_max, dtype=jnp.int32)
    NEG = mas._NEG

    def fwd_step(prev, inputs):
        y, col = inputs
        v_cur = jnp.where(x_ids[None, :] == y, NEG, prev)
        shifted = jnp.pad(prev, ((0, 0), (1, 0)), constant_values=NEG)[:, :-1]
        first = jnp.where(y == 0, jnp.asarray(0.0, dtype), jnp.asarray(NEG, dtype))
        v_prev = jnp.where(x_ids[None, :] == 0, first, shifted)
        cand = col + jnp.maximum(v_cur, v_prev)
        valid = (
            (x_ids[None, :] <= y)
            & (x_ids[None, :] >= t_xs[:, None] + y - t_ys[:, None])
            & (x_ids[None, :] < t_xs[:, None])
            & (y < t_ys[:, None])
        )
        new = jnp.where(valid, cand, NEG)
        return new, new

    cols = jnp.moveaxis(value, 2, 0)
    ys = jnp.arange(t_y_max, dtype=jnp.int32)
    init = jnp.full((b, t_x_max), NEG, dtype)
    _, acc = jax.lax.scan(fwd_step, init, (ys, cols))
    return acc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--tx", type=int, default=96)
    p.add_argument("--ty", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    value, mask = make_inputs(args.batch, args.tx, args.ty)
    it = args.iters

    # explicitly the scan form: mas.maximum_path auto-dispatches to the
    # pallas kernel on single-device TPU, which would benchmark pallas
    # against itself
    base = timed(jax.jit(mas.maximum_path_scan), value, mask, iters=it)
    print(f"maximum_path_scan:     {base*1e3:8.2f} ms", flush=True)

    fwd = timed(jax.jit(forward_only), value, mask, iters=it)
    print(f"forward scan only:     {fwd*1e3:8.2f} ms "
          f"(backtrace ≈ {(base-fwd)*1e3:.2f})", flush=True)

    if hasattr(mas, "maximum_path_pallas"):
        pk = timed(jax.jit(mas.maximum_path_pallas), value, mask, iters=it)
        ref = jax.jit(mas.maximum_path_scan)(value, mask)
        got = jax.jit(mas.maximum_path_pallas)(value, mask)
        same = bool(jnp.all(ref == got))
        print(f"pallas wavefront:      {pk*1e3:8.2f} ms "
              f"({base/pk:.1f}x, exact={same})", flush=True)


if __name__ == "__main__":
    main()
