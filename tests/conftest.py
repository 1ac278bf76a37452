"""Test env: force the JAX CPU backend with 8 virtual devices so mesh /
data-parallel logic is exercised without TPU hardware. Must run before the
first `import jax` anywhere in the test session."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the driver presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compile cache: XLA-CPU compiles are slow on this 1-core host;
# cache them across test runs.
_CACHE_DIR = os.path.expanduser("~/.cache/jax_test_compile_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU through
# the config as well (must happen before the first backend use).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
