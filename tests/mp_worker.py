"""Worker for the two-process multi-host integration test
(tests/test_multihost.py). Each OS process is one 'host': it joins the
jax.distributed runtime (gloo CPU collectives), loads only its own filelist
shard via BucketBatcher(process_count=2), assembles the global dp-sharded
batch with jax.make_array_from_process_local_data, and runs one
data-parallel train step. Usage:

    python tests/mp_worker.py <coordinator> <process_id> <filelist> <out>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main():
    coordinator, process_id, filelist, out_path = (
        sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    from dex_tts_tpu.parallel import runtime

    assert runtime.initialize(
        coordinator_address=coordinator, num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    from dex_tts_tpu.data import BucketBatcher, TextMelDataset
    from dex_tts_tpu.parallel import (
        assemble_global_batch,
        make_mesh,
        make_parallel_train_step,
        replicate_state,
    )
    from dex_tts_tpu.train import create_train_state, make_train_step
    from tests.test_train import tiny_model

    model = tiny_model()
    ds = TextMelDataset(filelist, load_style=False)
    batcher = BucketBatcher(
        ds, batch_size=8, x_quantum=8, y_quantum=16, seed=0, shuffle=False,
        sort_by_length=False, process_count=2, process_index=process_id,
        prefetch=0,
    )
    local = next(iter(batcher))
    assert local["x"].shape[0] == 4  # this host's shard of the global 8
    # same seed on every host -> identical initial params (no broadcast
    # needed; the real pod flow relies on the same invariant)
    state, tx = create_train_state(model, local, out_size=16, lr=1e-3)

    mesh = make_mesh(8)
    step = make_parallel_train_step(
        make_train_step(model, tx, out_size=16, ema_decay=0.99),
        mesh,
        donate=False,
    )
    pstate = replicate_state(state, mesh)
    gbatch = assemble_global_batch(local, mesh)
    assert gbatch["x"].shape[0] == 8  # global batch across both hosts
    _, metrics = step(pstate, gbatch)
    total = float(metrics["total_loss"])

    # dp2×tp2 across the process boundary (VERDICT r4 item 5): params
    # tp-sharded over a mesh whose 'tp' pairs live inside one host but
    # whose 'dp' axis spans both — the gradient all-reduce AND the
    # Megatron activation collectives ride the gloo backend.
    from dex_tts_tpu.parallel import tp_state_shardings

    mesh_tp = make_mesh(8, tp_size=2)
    shardings = tp_state_shardings(state, mesh_tp)
    pstate_tp = jax.device_put(state, shardings)
    step_tp = make_parallel_train_step(
        make_train_step(model, tx, out_size=16, ema_decay=0.99),
        mesh_tp,
        donate=False,
        state_shardings=shardings,
    )
    gbatch_tp = assemble_global_batch(local, mesh_tp)
    _, metrics_tp = step_tp(pstate_tp, gbatch_tp)
    tp_total = float(metrics_tp["total_loss"])

    with open(out_path, "w") as f:
        json.dump({"process": process_id, "total_loss": total,
                   "tp_total_loss": tp_total}, f)
    print(f"worker {process_id}: total_loss={total} tp={tp_total}",
          flush=True)


if __name__ == "__main__":
    main()
