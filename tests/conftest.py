"""Test env: force the JAX CPU backend with 8 virtual devices so mesh /
data-parallel logic is exercised without TPU hardware. Must run before the
first `import jax` anywhere in the test session."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the driver presets axon (TPU)
os.environ.setdefault("HF_HUB_OFFLINE", "1")  # no network: skip hub retries
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU through
# the config as well (must happen before the first backend use).
# NB: no persistent compilation cache here — XLA:CPU AOT cache entries on
# this host carry mismatched machine-feature lists and abort (SIGILL) when
# reloaded across processes.
jax.config.update("jax_platforms", "cpu")
