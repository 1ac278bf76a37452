import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dex_tts_tpu.data import BucketBatcher, TextMelDataset
from dex_tts_tpu.models.dit import DiTConfig
from dex_tts_tpu.models.tts import GeDEXTTS
from dex_tts_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicate_state,
    shard_batch,
)
from dex_tts_tpu.train import create_train_state, make_train_step
from dex_tts_tpu.train.checkpoint import CheckpointManager
from dex_tts_tpu.train.state import make_optimizer
from dex_tts_tpu.train.trainer import make_valid_step

TINY_DIT = DiTConfig(
    patch_size=3, stride_size=2, hidden_size=32, depth=1, num_heads=2,
    mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2,
)


def tiny_model():
    return GeDEXTTS(
        n_vocab=149, n_feats=16, enc_channels=24, enc_filter_channels=32,
        enc_filter_channels_dp=16, enc_heads=2, enc_layers=2, dec_dim=8,
        dec_dim_mults=(1, 2), dit=TINY_DIT,
    )


def tiny_batch(b=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": rng.integers(1, 148, (b, 12)).astype(np.int32),
        "x_lengths": np.full((b,), 12, np.int32),
        "y": rng.standard_normal((b, 16, 32)).astype(np.float32),
        "y_lengths": np.asarray(([32, 28, 20, 32] * 2)[:b], np.int32),
    }


@pytest.fixture(scope="module")
def model_state():
    model = tiny_model()
    state, tx = create_train_state(model, tiny_batch(), out_size=16, lr=1e-3)
    return model, state, tx


@pytest.mark.slow
def test_train_step_reduces_loss(model_state):
    model, state, tx = model_state
    step = jax.jit(make_train_step(model, tx, out_size=16, ema_decay=0.99))
    batch = tiny_batch()
    first = None
    for _ in range(5):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["total_loss"])
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["grad_norm"]) > 0
    assert int(state.step) == 5
    # EMA drifted away from the (frozen-at-init) copy
    leaf = jax.tree.leaves(state.ema_params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_valid_step(model_state):
    model, state, _ = model_state
    vstep = jax.jit(make_valid_step(model, out_size=16))
    losses = vstep(state, tiny_batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["total_loss"]))


@pytest.mark.slow
def test_checkpoint_roundtrip(model_state, tmp_path):
    model, state, tx = model_state
    mgr = CheckpointManager(os.path.join(tmp_path, "ckpt"))
    mgr.save(state, "last")
    assert mgr.exists("last")
    restored = mgr.restore(state, "last")
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


@pytest.mark.slow
def test_checkpoint_async_roundtrip(model_state, tmp_path):
    """async_save: save() returns after the device->host copy; wait()/
    restore()/exists() serialize with the background write and the
    restored state is bitwise identical (train/checkpoint.py)."""
    import os
    model, state, tx = model_state
    mgr = CheckpointManager(os.path.join(tmp_path, "ckpt"), async_save=True)
    mgr.save(state, "a")
    mgr.save(state, "b")  # overlapping saves must serialize, not error
    # no explicit wait: exists()/restore() do it themselves
    assert mgr.exists("a") and mgr.exists("b")
    for tag in ("a", "b"):
        restored = mgr.restore(state, tag)
        for x, y in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert int(restored.step) == int(state.step)
    mgr.wait()  # idempotent with nothing in flight


@pytest.mark.slow
@pytest.mark.parametrize("async_save", [False, True])
def test_checkpoint_save_many_fanout(model_state, tmp_path, async_save):
    """save_many (ADVICE r4): one orbax write + hard-linked tag copies.
    Every tag restores bitwise-identically; re-saving over existing tags
    replaces them; under async_save the fanout runs in the background and
    wait()/restore() serialize with it."""
    import os
    model, state, tx = model_state
    mgr = CheckpointManager(
        os.path.join(tmp_path, "ckpt"), async_save=async_save
    )
    tags = ["best-train", "epoch-1", "last"]
    mgr.save_many(state, tags)
    for tag in tags:
        assert mgr.exists(tag)
        restored = mgr.restore(state, tag)
        for x, y in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # overwrite round: same tags again (rmtree+rename path) + a new one
    mgr.save_many(state, ["best-train", "last", "preempt"])
    for tag in ("best-train", "last", "preempt"):
        assert mgr.exists(tag)
        restored = mgr.restore(state, tag)
        assert int(restored.step) == int(state.step)
    mgr.wait()


@pytest.mark.slow
def test_data_parallel_matches_single_device(model_state):
    model, state, tx = model_state
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh(8)
    step_fn = make_train_step(model, tx, out_size=16, ema_decay=0.99)

    batch = tiny_batch(8)
    # single device
    s1, m1 = jax.jit(step_fn)(state, batch)
    # 8-way dp
    pstate = replicate_state(state, mesh)
    pbatch = shard_batch(batch, mesh)
    pstep = make_parallel_train_step(step_fn, mesh, donate=False)
    s8, m8 = pstep(pstate, pbatch)

    assert np.isclose(float(m1["total_loss"]), float(m8["total_loss"]), rtol=1e-4)
    p1 = jax.tree.leaves(s1.params)[0]
    p8 = jax.tree.leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)


@pytest.mark.slow
def test_tensor_parallel_matches_single_device(model_state):
    """dp=4 x tp=2: Megatron-style column/row param sharding (parallel/tp.py)
    must reproduce the single-device step numerics — XLA SPMD inserts the
    collectives."""
    from jax.sharding import PartitionSpec as P

    from dex_tts_tpu.parallel import shard_count, tp_state_shardings

    model, state, tx = model_state
    mesh = make_mesh(8, tp_size=2)
    step_fn = make_train_step(model, tx, out_size=16, ema_decay=0.99)

    batch = tiny_batch(8)
    s1, m1 = jax.jit(step_fn)(state, batch)

    shardings = tp_state_shardings(state, mesh)
    assert shard_count(shardings) > 0
    pstate = jax.device_put(state, shardings)
    fc1 = pstate.params["encoder"]["encoder"]["layer_0"]["ffn"]["fc1"]["kernel"]
    assert fc1.sharding.spec == P(None, "tp")  # actually split, not replicated

    pbatch = shard_batch(batch, mesh)
    pstep = make_parallel_train_step(
        step_fn, mesh, donate=False, state_shardings=shardings
    )
    s8, m8 = pstep(pstate, pbatch)

    assert np.isclose(float(m1["total_loss"]), float(m8["total_loss"]), rtol=1e-4)
    # updated params match, including a tp-sharded leaf gathered back
    np.testing.assert_allclose(
        np.asarray(s8.params["encoder"]["encoder"]["layer_0"]["ffn"]["fc1"]["kernel"]),
        np.asarray(s1.params["encoder"]["encoder"]["layer_0"]["ffn"]["fc1"]["kernel"]),
        atol=1e-5,
    )
    p1 = jax.tree.leaves(s1.params)[0]
    p8 = jax.tree.leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)
    # the new state kept its tp placement (no silent re-replication)
    fc1_new = s8.params["encoder"]["encoder"]["layer_0"]["ffn"]["fc1"]["kernel"]
    assert fc1_new.sharding.spec == P(None, "tp")


@pytest.mark.slow
def test_elastic_restore_across_topologies(model_state, tmp_path):
    """VERDICT r4 item 5 (elastic restart): an orbax checkpoint written
    from a dp=8 run restores into dp=4, single-device, and dp4×tp2 runs,
    and the loss trajectory continues identically — params/EMA/opt state
    are logically global, so topology is a restore-time choice. This is
    the same path `main.py --resume --n_devices N` takes (restore into
    the single-device template, then replicate/shard over the new mesh)."""
    from dex_tts_tpu.parallel import tp_state_shardings

    model, state, tx = model_state
    step_fn = make_train_step(model, tx, out_size=16, ema_decay=0.99)
    mgr = CheckpointManager(os.path.join(tmp_path, "ckpt"))

    mesh8 = make_mesh(8)
    pstep8 = make_parallel_train_step(step_fn, mesh8, donate=False)
    s = replicate_state(state, mesh8)
    b0, b1 = tiny_batch(8), tiny_batch(8, seed=3)
    s, _ = pstep8(s, shard_batch(b0, mesh8))
    mgr.save(s, "dp8")  # written from dp=8-replicated arrays

    # reference continuation at the original topology
    ref_state, ref_m = pstep8(s, shard_batch(b1, mesh8))
    ref_loss = float(ref_m["total_loss"])
    ref_leaf = np.asarray(jax.tree.leaves(ref_state.params)[0])

    # template as main.py builds it at boot: fresh single-device state
    template = state

    # (a) single-device continuation
    r1 = mgr.restore(template, "dp8")
    s1, m1 = jax.jit(step_fn)(r1, b1)
    assert np.isclose(float(m1["total_loss"]), ref_loss, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s1.params)[0]), ref_leaf, atol=1e-5
    )

    # (b) dp=4 continuation (shrunk topology)
    mesh4 = make_mesh(4)
    r4 = replicate_state(mgr.restore(template, "dp8"), mesh4)
    pstep4 = make_parallel_train_step(step_fn, mesh4, donate=False)
    s4, m4 = pstep4(r4, shard_batch(b1, mesh4))
    assert np.isclose(float(m4["total_loss"]), ref_loss, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s4.params)[0]), ref_leaf, atol=1e-5
    )

    # (c) dp4×tp2 continuation (reshaped topology, params tp-sharded)
    mesh_tp = make_mesh(8, tp_size=2)
    shardings = tp_state_shardings(template, mesh_tp)
    r_tp = jax.device_put(mgr.restore(template, "dp8"), shardings)
    pstep_tp = make_parallel_train_step(
        step_fn, mesh_tp, donate=False, state_shardings=shardings
    )
    s_tp, m_tp = pstep_tp(r_tp, shard_batch(b1, mesh_tp))
    assert np.isclose(float(m_tp["total_loss"]), ref_loss, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s_tp.params)[0]), ref_leaf, atol=1e-5
    )

    # (d) round-trip the OTHER way: a checkpoint written from the
    # tp-sharded state restores bitwise into a single-device template
    mgr.save(s_tp, "tp")
    r_back = mgr.restore(template, "tp")
    for a, b in zip(jax.tree.leaves(s_tp.params),
                    jax.tree.leaves(r_back.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(r_back.step) == int(s_tp.step)


def make_fake_dataset(root, n_items=10, n_mels=16):
    rng = np.random.default_rng(0)
    mel_dir = os.path.join(root, "mel")
    os.makedirs(mel_dir, exist_ok=True)
    lines = []
    texts = ["hello world", "the cat sat", "on a mat today", "ok then"]
    for i in range(n_items):
        t = 20 + int(rng.integers(0, 40))
        mel = rng.standard_normal((t, n_mels)).astype(np.float32)
        path = os.path.join(mel_dir, f"spk-mel-{i:03d}.npy")
        np.save(path, mel)
        lines.append(f"{path}|{texts[i % len(texts)]}|{i % 2}")
    fl = os.path.join(root, "train.txt")
    with open(fl, "w") as f:
        f.write("\n".join(lines))
    return fl


def test_dataset_and_batcher(tmp_path):
    fl = make_fake_dataset(str(tmp_path))
    ds = TextMelDataset(fl)
    assert len(ds) == 10
    item = ds[0]
    assert item["y"].shape[0] == 16
    assert item["x"].dtype == np.int32
    # blank interspersed: odd length, blanks at even positions
    assert item["x"][0] == 148 and len(item["x"]) % 2 == 1

    batcher = BucketBatcher(ds, batch_size=4, x_quantum=8, y_quantum=16)
    batches = list(batcher)
    assert len(batches) == 2
    for b in batches:
        assert b["x"].shape[0] == 4
        assert b["x"].shape[1] % 8 == 0
        assert b["y"].shape[2] % 16 == 0 and b["y"].shape[2] % 4 == 0
        assert (b["y_lengths"] <= b["y"].shape[2]).all()
        # padding is zero beyond each item's length
        i = int(np.argmin(b["y_lengths"]))
        assert b["y"][i, :, b["y_lengths"][i]:].sum() == 0


def test_dataset_style_loading(tmp_path):
    fl = make_fake_dataset(str(tmp_path))
    lf0_dir = os.path.join(str(tmp_path), "lf0")
    os.makedirs(lf0_dir, exist_ok=True)
    rng = np.random.default_rng(1)
    for i in range(10):
        mel = np.load(os.path.join(str(tmp_path), "mel", f"spk-mel-{i:03d}.npy"))
        lf0 = rng.standard_normal(mel.shape[0]).astype(np.float32)
        lf0[::4] = 0.0  # unvoiced frames
        np.save(os.path.join(lf0_dir, f"spk-lf0-{i:03d}.npy"), lf0)
    ds = TextMelDataset(fl, load_style=True)
    item = ds[0]
    assert set(item) >= {"x", "y", "ref", "sty", "lf0"}
    voiced = item["lf0"] != 0
    assert abs(item["lf0"][voiced].mean()) < 0.2  # normalized over voiced
    batch = next(iter(BucketBatcher(ds, batch_size=4)))
    assert batch["ref"].shape == batch["y"].shape
    assert batch["lf0"].shape == (4, batch["y"].shape[2])


def test_process_sharded_batcher(tmp_path):
    """process_count=2 shards load disjoint halves whose concat equals the
    single-process batch and whose bucket shapes agree globally (the
    multi-host data-feeding contract; SURVEY §2.2)."""
    fl = make_fake_dataset(str(tmp_path))
    kw = dict(batch_size=4, x_quantum=8, y_quantum=16, shuffle=False,
              sort_by_length=False, prefetch=0)
    full = list(BucketBatcher(TextMelDataset(fl), **kw))
    shard0 = list(BucketBatcher(TextMelDataset(fl), process_count=2,
                                process_index=0, **kw))
    shard1 = list(BucketBatcher(TextMelDataset(fl), process_count=2,
                                process_index=1, **kw))
    assert len(full) == len(shard0) == len(shard1)
    for f, a, b in zip(full, shard0, shard1):
        for k in f:
            assert a[k].shape == b[k].shape
            assert a[k].shape[0] == f[k].shape[0] // 2
            np.testing.assert_array_equal(
                np.concatenate([a[k], b[k]], axis=0), f[k]
            )


def test_batcher_prefetch_equivalence(tmp_path):
    fl = make_fake_dataset(str(tmp_path))
    kw = dict(batch_size=4, x_quantum=8, y_quantum=16, seed=7)
    eager = list(BucketBatcher(TextMelDataset(fl, seed=7), prefetch=0, **kw))
    threaded = list(BucketBatcher(TextMelDataset(fl, seed=7), prefetch=2, **kw))
    assert len(eager) == len(threaded) == 2
    for e, t in zip(eager, threaded):
        for k in e:
            np.testing.assert_array_equal(e[k], t[k])


@pytest.mark.slow
def test_assembled_global_batch_matches_single_device(model_state):
    """Local-shard assembly via jax.make_array_from_process_local_data feeds
    the dp step with the same numbers as a plain single-device step."""
    from dex_tts_tpu.parallel import assemble_global_batch

    model, state, tx = model_state
    mesh = make_mesh(8)
    step_fn = make_train_step(model, tx, out_size=16, ema_decay=0.99)

    batch = tiny_batch(8)
    s1, m1 = jax.jit(step_fn)(state, batch)

    gbatch = assemble_global_batch(batch, mesh)  # 1 process: local == global
    for v in gbatch.values():
        assert v.sharding.spec[0] == "dp"
    pstate = replicate_state(state, mesh)
    pstep = make_parallel_train_step(step_fn, mesh, donate=False)
    s8, m8 = pstep(pstate, gbatch)
    assert np.isclose(float(m1["total_loss"]), float(m8["total_loss"]), rtol=1e-4)


@pytest.mark.slow
def test_trainer_epoch_metric_accumulation(tmp_path):
    """run_epoch's device-side metric sums average to the same values as
    stepping manually (single host sync per epoch)."""
    from dex_tts_tpu.train import Trainer

    model = tiny_model()
    state, tx = create_train_state(model, tiny_batch(), out_size=16, lr=1e-3)
    batches = [tiny_batch(), tiny_batch(), tiny_batch()]

    trainer = Trainer(
        model, state, tx, exp_dir=str(tmp_path), out_size=16,
        ema_decay=0.99, donate=False,
    )
    # manual reference: same step fn, same state, same batches
    want_state = state
    sums = {}
    for b in batches:
        want_state, m = trainer.train_step(want_state, b)
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
    want = {k: v / len(batches) for k, v in sums.items()}

    got = trainer.run_epoch(iter(batches), train=True)
    assert set(got) == set(want)
    for k in want:
        assert np.isclose(got[k], want[k], rtol=1e-5), (k, got[k], want[k])
    assert int(trainer.state.step) == 3

    # validation path
    got_val = trainer.run_epoch(iter(batches), train=False)
    assert np.isfinite(got_val["total_loss"])


@pytest.mark.slow
def test_gradient_accumulation(model_state):
    """accum_steps>1: one optimizer update from sequentially folded
    micro-batches — runs under jit, finite metrics, stats threaded, and is
    deterministic for fixed inputs."""
    model, state, tx = model_state
    step2 = jax.jit(
        make_train_step(model, tx, out_size=16, ema_decay=0.99, accum_steps=2)
    )
    batch = tiny_batch(4)
    s_a, m_a = step2(state, batch)
    s_b, m_b = step2(state, batch)
    assert np.isfinite(float(m_a["total_loss"]))
    assert float(m_a["grad_norm"]) > 0
    assert int(s_a.step) == 1
    # deterministic given identical state+batch
    assert float(m_a["total_loss"]) == float(m_b["total_loss"])
    p_a = jax.tree.leaves(s_a.params)[0]
    p_b = jax.tree.leaves(s_b.params)[0]
    np.testing.assert_array_equal(np.asarray(p_a), np.asarray(p_b))
    # params moved somewhere in the tree (the first leaf may be a
    # zero-init gate with zero gradient)
    import optax

    delta = optax.global_norm(
        jax.tree.map(lambda a, b: a - b, s_a.params, state.params)
    )
    assert float(delta) > 0


@pytest.mark.slow
def test_preemption_checkpoints_and_exits(tmp_path):
    """SIGTERM mid-epoch → the Trainer finishes the in-flight step, saves
    last/preempt, and fit() returns early; resume picks up the state
    (reference has no preemption story — SURVEY §5; this is the pod
    maintenance/reclaim path, train/preemption.py)."""
    import signal

    from dex_tts_tpu.train import PreemptionGuard, Trainer

    model = tiny_model()
    state, tx = create_train_state(model, tiny_batch(), out_size=16, lr=1e-3)
    guard = PreemptionGuard()
    try:
        trainer = Trainer(
            model, state, tx, exp_dir=str(tmp_path), out_size=16,
            ema_decay=0.99, donate=False, preemption=guard,
        )

        fired = {"n": 0}

        def loader():
            for i in range(50):
                fired["n"] = i + 1
                if i == 2:
                    signal.raise_signal(signal.SIGTERM)
                yield tiny_batch()

        out_state = trainer.fit(lambda: loader(), epochs=3)
        # the signal landed while batch 3 was being yielded; the loop polls
        # before processing it, so exactly 2 steps ran instead of 50 x 3
        assert fired["n"] <= 4
        assert int(out_state.step) == 2
        assert trainer.ckpt.exists("last") and trainer.ckpt.exists("preempt")
        restored = trainer.ckpt.restore(state, "preempt")
        assert int(restored.step) == int(out_state.step)
    finally:
        guard.restore()
