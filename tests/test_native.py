import jax.numpy as jnp
import numpy as np
import pytest

from dex_tts_tpu.ops import maximum_path

native = pytest.importorskip("dex_tts_tpu.native")


def test_native_builds_and_matches_device_mas():
    rng = np.random.default_rng(0)
    shapes = [(5, 12), (3, 3), (1, 7), (8, 20)]
    b, tx, ty = len(shapes), 8, 20
    value = rng.standard_normal((b, tx, ty)).astype(np.float32)
    mask = np.zeros((b, tx, ty), np.float32)
    for i, (x, y) in enumerate(shapes):
        mask[i, :x, :y] = 1.0

    got = native.maximum_path_native(value, mask)
    want = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    np.testing.assert_array_equal(got, want)
    assert native.load_library().mas_num_threads() >= 1
