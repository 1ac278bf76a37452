"""Two-PROCESS multi-host integration: real jax.distributed runtime over
gloo CPU collectives (each process = one 'host' with 4 virtual devices),
per-process filelist sharding, jax.make_array_from_process_local_data
assembly, and a data-parallel step whose loss matches the single-process
step bit-for-bit in expectation. This is the closest CPU-side rehearsal of
a TPU pod-slice run (SURVEY §2.2); the single-process pieces are covered
in tests/test_train.py."""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from tests.test_train import make_fake_dataset, tiny_model

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step(tmp_path):
    fl = make_fake_dataset(str(tmp_path))
    port = _free_port()
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    env = {k: v for k, v in os.environ.items() if not k.startswith("XLA_")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             f"127.0.0.1:{port}", str(i), fl, outs[i]],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    losses, tp_losses = [], []
    for path in outs:
        with open(path) as f:
            rec = json.load(f)
        losses.append(rec["total_loss"])
        tp_losses.append(rec["tp_total_loss"])
    # both hosts computed the same (psum-reduced) global loss
    assert np.isclose(losses[0], losses[1], rtol=1e-5), losses
    # ... dp2×tp2 across the process boundary agrees on both hosts and
    # with the pure-dp step (VERDICT r4 item 5: tp over gloo)
    assert np.isclose(tp_losses[0], tp_losses[1], rtol=1e-5), tp_losses
    assert np.isclose(tp_losses[0], losses[0], rtol=1e-4), (
        tp_losses[0], losses[0])

    # ... and it matches the single-process step on the concatenated batch
    from dex_tts_tpu.data import BucketBatcher, TextMelDataset
    from dex_tts_tpu.train import create_train_state, make_train_step

    full = next(iter(BucketBatcher(
        TextMelDataset(fl, load_style=False), batch_size=8, x_quantum=8,
        y_quantum=16, seed=0, shuffle=False, sort_by_length=False,
        prefetch=0,
    )))
    model = tiny_model()
    state, tx = create_train_state(model, full, out_size=16, lr=1e-3)
    _, metrics = jax.jit(
        make_train_step(model, tx, out_size=16, ema_decay=0.99)
    )(state, full)
    ref = float(metrics["total_loss"])
    assert np.isclose(losses[0], ref, rtol=1e-4), (losses[0], ref)
