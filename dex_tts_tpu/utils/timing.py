"""Wall-clock timing for jitted functions on the remote-TPU (axon) backend.

The tunnel's semantics require materializing a scalar on the host per
iteration — `block_until_ready` alone does not wait for remote completion
(CLAUDE.md). Per-dispatch overhead is ~30 ms; when timing small ops,
subtract it or compare against a same-shape baseline.
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np


def time_fn(fn, *args, iters: int = 3, assert_finite: bool = False) -> float:
    """Mean wall seconds per `fn(*args)` call after a compile+warmup call."""
    out = fn(*args)
    first = out[0] if isinstance(out, tuple) else out
    s = float(jnp.sum(first))
    if assert_finite:
        assert np.isfinite(s), "non-finite output"
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        first = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(first))
    return (time.perf_counter() - t0) / iters
