import jax
import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.ops import (
    duration_loss,
    fix_len_compatibility,
    generate_path,
    maximum_path,
    random_segment,
    sequence_mask,
)


def oracle_maximum_path(value, t_x, t_y, max_neg=-1e9):
    """Literal numpy transcription of the reference Cython DP recurrence
    (independent oracle for the jittable kernel)."""
    value = value.copy()
    path = np.zeros_like(value, dtype=np.int32)
    for y in range(t_y):
        for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
            v_cur = max_neg if x == y else value[x, y - 1]
            if x == 0:
                v_prev = 0.0 if y == 0 else max_neg
            else:
                v_prev = value[x - 1, y - 1]
            value[x, y] = max(v_cur, v_prev) + value[x, y]
    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[index, y] = 1
        if index != 0 and (
            index == y or value[index, y - 1] < value[index - 1, y - 1]
        ):
            index -= 1
    return path


def make_batch(rng, shapes, t_x_max, t_y_max):
    b = len(shapes)
    value = rng.standard_normal((b, t_x_max, t_y_max)).astype(np.float32)
    mask = np.zeros((b, t_x_max, t_y_max), np.float32)
    for i, (tx, ty) in enumerate(shapes):
        mask[i, :tx, :ty] = 1.0
    return value, mask


def test_maximum_path_matches_oracle():
    rng = np.random.default_rng(0)
    shapes = [(5, 12), (3, 3), (1, 7), (8, 20), (7, 8)]
    value, mask = make_batch(rng, shapes, 8, 20)
    path = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    for i, (tx, ty) in enumerate(shapes):
        expected = oracle_maximum_path(value[i, :tx, :ty] * 1.0, tx, ty)
        np.testing.assert_array_equal(path[i, :tx, :ty], expected)
        # nothing outside the mask
        assert path[i, tx:, :].sum() == 0
        assert path[i, :, ty:].sum() == 0


def test_maximum_path_properties():
    rng = np.random.default_rng(1)
    shapes = [(4, 10), (6, 6)]
    value, mask = make_batch(rng, shapes, 6, 10)
    path = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    for i, (tx, ty) in enumerate(shapes):
        p = path[i, :tx, :ty]
        # each frame assigned to exactly one token
        np.testing.assert_array_equal(p.sum(axis=0), np.ones(ty))
        # every token consumes >= 1 frame (tx <= ty), durations monotonic
        assert (p.sum(axis=1) >= 1).all()
        tokens = p.argmax(axis=0)
        assert (np.diff(tokens) >= 0).all()


def test_maximum_path_jit_and_grad_free():
    value = jnp.asarray(np.random.default_rng(2).standard_normal((2, 4, 9)),
                        dtype=jnp.float32)
    mask = jnp.ones((2, 4, 9), jnp.float32)
    jitted = jax.jit(maximum_path)
    np.testing.assert_array_equal(
        np.asarray(jitted(value, mask)), np.asarray(maximum_path(value, mask))
    )


def test_sequence_mask():
    m = sequence_mask(jnp.asarray([2, 4]), 5)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[True, True, False, False, False], [True, True, True, True, False]],
    )


def test_fix_len_compatibility():
    assert fix_len_compatibility(172) == 172
    assert fix_len_compatibility(170) == 172
    assert fix_len_compatibility(1) == 4
    assert fix_len_compatibility(8, 3) == 8
    assert fix_len_compatibility(9, 3) == 16


def test_generate_path():
    duration = jnp.asarray([[2.0, 1.0, 3.0]])
    mask = jnp.ones((1, 3, 6), jnp.float32)
    path = np.asarray(generate_path(duration, mask))
    expected = np.array(
        [
            [1, 1, 0, 0, 0, 0],
            [0, 0, 1, 0, 0, 0],
            [0, 0, 0, 1, 1, 1],
        ],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(path[0], expected)


def test_generate_path_roundtrip_with_mas():
    # durations recovered from a MAS path should regenerate the same path
    rng = np.random.default_rng(3)
    value, mask = make_batch(rng, [(4, 9)], 4, 9)
    path = maximum_path(jnp.asarray(value), jnp.asarray(mask))
    durations = jnp.sum(path, axis=-1)
    regen = generate_path(durations, jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(regen), np.asarray(path))


def test_duration_loss():
    logw = jnp.asarray([[1.0, 2.0]])
    logw_ = jnp.asarray([[1.5, 2.5]])
    lengths = jnp.asarray([2])
    assert np.isclose(float(duration_loss(logw, logw_, lengths)), 0.25)


def test_random_segment():
    key = jax.random.PRNGKey(0)
    b, f, ty, out = 3, 4, 20, 8
    y = jnp.arange(b * f * ty, dtype=jnp.float32).reshape(b, f, ty)
    attn = jnp.ones((b, 5, ty), jnp.float32)
    y_lengths = jnp.asarray([20, 6, 8])
    y_cut, attn_cut, cut_lens, cut_mask = random_segment(key, y, attn, y_lengths, out)
    assert y_cut.shape == (b, f, out)
    assert attn_cut.shape == (b, 5, out)
    np.testing.assert_array_equal(np.asarray(cut_lens), [8, 6, 8])
    # short item: masked beyond its length
    assert np.asarray(y_cut)[1, :, 6:].sum() == 0
    # values are a contiguous window of the source
    row = np.asarray(y_cut)[0, 0]
    assert (np.diff(row) == 1).all()


def test_maximum_path_pallas_matches_scan():
    """The pallas wavefront kernel (interpret mode on CPU) is bit-exact
    vs the scan implementation and the numpy oracle on ragged batches,
    including a batch size that forces grid splitting."""
    from dex_tts_tpu.ops.mas import maximum_path_pallas, maximum_path_scan

    rng = np.random.default_rng(7)
    shapes = [(5, 12), (3, 3), (1, 7), (8, 20), (7, 8), (8, 8), (2, 19),
              (6, 16)]
    value, mask = make_batch(rng, shapes, 8, 20)
    v, m = jnp.asarray(value), jnp.asarray(mask)
    ref = np.asarray(maximum_path_scan(v, m))
    got = np.asarray(maximum_path_pallas(v, m, interpret=True))
    np.testing.assert_array_equal(got, ref)
    for i, (tx, ty) in enumerate(shapes):
        expected = oracle_maximum_path(value[i, :tx, :ty] * 1.0, tx, ty)
        np.testing.assert_array_equal(got[i, :tx, :ty], expected)


def test_maximum_path_pallas_grid_split(monkeypatch):
    """VMEM-driven batch splitting (grid > 1) returns the same paths."""
    from dex_tts_tpu.ops import mas

    rng = np.random.default_rng(11)
    shapes = [(5, 12), (3, 3), (8, 20), (7, 8)]
    value, mask = make_batch(rng, shapes, 8, 20)
    v, m = jnp.asarray(value), jnp.asarray(mask)
    whole = np.asarray(mas.maximum_path_pallas(v, m, interpret=True))
    # call the unjitted function: the jitted wrapper's cache would skip
    # the monkeypatched block picker entirely
    picked = []
    monkeypatch.setattr(
        mas, "_pick_batch_block", lambda b, tx, ty: (picked.append(b), 2)[1]
    )
    split = np.asarray(
        mas.maximum_path_pallas.__wrapped__(v, m, interpret=True)
    )
    assert picked  # the 2-item grid split really ran
    np.testing.assert_array_equal(split, whole)


def test_mas_backend_dispatch(monkeypatch):
    """set_mas_backend forces an implementation; auto picks scan on EVERY
    backend — the pallas kernel is opt-in only. Regression lock for the
    bench_train batch-128 dur_loss blow-up (VERDICT r3 item 2): the
    kernel's operands corrupt silently at large batch grids on the v5e
    remote backend (ops/mas.py module docstring point 2), so a TPU
    default of 'pallas' must never come back without that bug being
    re-cleared on hardware."""
    from dex_tts_tpu.ops import mas

    calls = []
    real = mas.maximum_path_scan
    monkeypatch.setattr(
        mas, "maximum_path_scan",
        lambda v, m: (calls.append("scan"), real(v, m))[1],
    )
    rng = np.random.default_rng(3)
    value, mask = make_batch(rng, [(3, 5), (4, 6)], 4, 6)
    v, m = jnp.asarray(value), jnp.asarray(mask)
    mas.maximum_path(v, m)
    assert calls == ["scan"]  # CPU backend → scan
    # ... and still scan if the backend looks like a single-device TPU
    monkeypatch.setattr(mas.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(mas.jax, "device_count", lambda: 1)
    mas.maximum_path(v, m)
    assert calls == ["scan", "scan"]
    try:
        mas.set_mas_backend("scan")
        mas.maximum_path(v, m)
        assert calls == ["scan", "scan", "scan"]
    finally:
        mas.set_mas_backend(None)


def test_maximum_path_pallas_vmem_overflow_falls_back(monkeypatch):
    """Shapes whose bb=1 working set exceeds the VMEM budget must dispatch
    to the scan form instead of compiling a kernel that cannot fit
    (5·Ty·Tx f32 > ~10 MB even at batch block 1)."""
    from dex_tts_tpu.ops import mas

    assert not mas._fits_vmem(1, 512, 2048)  # the pathological bucket
    assert mas._fits_vmem(1, 96, 768)        # the bench bucket fits

    calls = []
    real = mas.maximum_path_scan
    monkeypatch.setattr(
        mas, "maximum_path_scan",
        lambda v, m: (calls.append("scan"), real(v, m))[1],
    )
    # tiny VMEM budget so a small tensor trips the guard without the cost
    # of materializing a real 512x2048 DP on CPU
    monkeypatch.setattr(mas, "_VMEM_BUDGET_ELEMS", 100)
    rng = np.random.default_rng(5)
    shapes = [(5, 12), (3, 7)]
    value, mask = make_batch(rng, shapes, 8, 16)
    v, m = jnp.asarray(value), jnp.asarray(mask)
    got = np.asarray(
        mas.maximum_path_pallas.__wrapped__(v, m, interpret=True)
    )
    assert calls == ["scan"]  # guard fired: no pallas_call was built
    for i, (tx, ty) in enumerate(shapes):
        expected = oracle_maximum_path(value[i, :tx, :ty] * 1.0, tx, ty)
        np.testing.assert_array_equal(got[i, :tx, :ty], expected)


def test_mas_pallas_guard_trips_on_corrupt_path(monkeypatch):
    """VERDICT r4 item 6: the opt-in pallas dispatcher path carries a
    runtime invariant guard (per-item sum(path) == masked frame count)
    that raises MASPathError on the known all-zero-corruption mode
    instead of silently training on zero alignments."""
    import warnings as _warnings

    import pytest

    from dex_tts_tpu.ops import mas

    rng = np.random.default_rng(17)
    value, mask = make_batch(rng, [(3, 5), (4, 6)], 4, 6)
    v, m = jnp.asarray(value), jnp.asarray(mask)

    # simulate the corruption: the pallas kernel returns all-zero paths
    monkeypatch.setattr(
        mas, "maximum_path_pallas", lambda val, msk: jnp.zeros_like(val)
    )
    with pytest.warns(UserWarning, match="SILENT-corruption"):
        mas.set_mas_backend("pallas")
    try:
        with pytest.raises(mas.MASPathError, match="invariant violated"):
            mas.maximum_path(v, m)  # eager: callback raises inline
        # under jit the callback error surfaces at the sync point as a
        # runtime error carrying the message
        with pytest.raises(Exception, match="invariant violated"):
            jax.block_until_ready(
                jax.jit(lambda a, b: mas.maximum_path(a, b))(v, m)
            )
        # guard can be disabled explicitly (escape hatch)
        mas.set_mas_guard(False)
        out = np.asarray(mas.maximum_path(v, m))
        assert (out == 0).all()
    finally:
        mas.set_mas_guard(True)
        mas.set_mas_backend(None)

    # healthy paths pass the guard both eagerly and under jit
    monkeypatch.setattr(mas, "maximum_path_pallas", mas.maximum_path_scan)
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        mas.set_mas_backend("pallas")
    try:
        ref = np.asarray(mas.maximum_path_scan(v, m))
        np.testing.assert_array_equal(np.asarray(mas.maximum_path(v, m)), ref)
        np.testing.assert_array_equal(
            np.asarray(jax.jit(lambda a, b: mas.maximum_path(a, b))(v, m)), ref
        )
    finally:
        mas.set_mas_backend(None)


def test_check_mas_path_counts():
    """check_mas_path passes exact one-hot-per-frame paths and rejects a
    path with a single dropped frame (not just the all-zero case)."""
    import pytest

    from dex_tts_tpu.ops import mas

    rng = np.random.default_rng(23)
    value, mask = make_batch(rng, [(5, 12), (3, 8)], 6, 12)
    v, m = jnp.asarray(value), jnp.asarray(mask)
    path = mas.maximum_path_scan(v, m)
    out = mas.check_mas_path(path, m)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(path))

    broken = np.asarray(path).copy()
    y = np.nonzero(broken[1].sum(axis=0))[0][-1]
    broken[1, :, y] = 0.0  # drop one frame's emission
    with pytest.raises(mas.MASPathError, match="1/2 items corrupt"):
        mas.check_mas_path(jnp.asarray(broken), m)
