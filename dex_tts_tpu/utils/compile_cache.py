"""Persistent XLA compilation cache for fast cold-starts.

The reference has no compile-time concern (eager torch); here every
(text, frame) bucket is an XLA program whose first TPU compile takes
~1-3 minutes over the remote link. Serving restarts and periodic jobs
should not pay that again: JAX's persistent compilation cache keys the
serialized executable by (HLO, compiler flags, libtpu version) and
reloads it from disk on the next process.

TPU-only by design: on the CPU backend stale AOT artifacts have been
observed to SIGILL on reload (see CLAUDE.md / tests/conftest.py), so
`enable_compile_cache` refuses non-TPU backends unless forced.

Usage: ``serve.py --compile_cache DIR`` / ``main.py train
--compile_cache DIR``, or call :func:`enable_compile_cache` before the
first jit dispatch (already-compiled programs are not retro-cached).
"""

from __future__ import annotations

import os
import warnings

import jax


def enable_compile_cache(
    cache_dir: str,
    min_compile_time_secs: float = 1.0,
    force: bool = False,
) -> bool:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns True if enabled. On non-TPU backends this is a warned no-op
    (``force=True`` overrides — e.g. GPU, where the cache is sound).
    ``min_compile_time_secs`` skips caching trivial programs (the
    duration-predictor pre-dispatch graphs compile in well under a
    second and would only churn the directory).
    """
    backend = jax.default_backend()
    if backend != "tpu" and not force:
        warnings.warn(
            f"compile cache requested on backend={backend!r}: skipped "
            "(CPU AOT artifacts can SIGILL on reload; pass force=True "
            "for non-TPU backends you trust)",
            stacklevel=2,
        )
        return False
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    # cache regardless of how often a program is hit: serving buckets are
    # few and each one is expensive
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return True
