"""Train / evaluate CLI.

Usage (mirrors the reference CLI shape — reference: DEX-TTS/main.py:21-67,
argument.py:3-23):

  python main.py train --config dex_tts_tpu/config/presets/vctk.yaml
  python main.py test  --config ... --test_checkpoint <exp_dir> [--sample_size N]
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from dex_tts_tpu.config import build_model
from dex_tts_tpu.data import BucketBatcher, TextMelDataset
from dex_tts_tpu.models.edm import SamplerConfig
from dex_tts_tpu.ops import fix_len_compatibility
from dex_tts_tpu.train import PreemptionGuard, Trainer, create_train_state
from dex_tts_tpu.utils import Config, seed_init, set_experiment


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("action", choices=["train", "test"])
    p.add_argument("--config", required=True)
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--n_timesteps", type=int, default=50)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--tag", type=str, default=None)
    p.add_argument("--test_checkpoint", type=str, default=None)
    p.add_argument("--test_file", type=str, default=None)
    p.add_argument("--sample_size", type=int, default=10)
    p.add_argument("--n_devices", type=int, default=None)
    p.add_argument("--compile_cache", default=None, metavar="DIR",
                   help="persistent XLA compile cache dir (TPU only): "
                        "restarts/resumes skip recompiling each bucket")
    p.add_argument("--dit_cache_interval", type=int, default=1,
                   help="test action: objective-eval the approximate "
                        "turbo sampler (DiT mid-block reused for k-1 of "
                        "every k steps; 1 = exact) to quantify its "
                        "quality cost on a trained model")
    p.add_argument("--solver", default="euler",
                   choices=["euler", "heun", "dpmpp2m"],
                   help="ODE solver for test-action eval and train-time periodic synthesis; dpmpp2m (DPM-Solver++ 2M, 2nd-order "
                        "multistep) reaches the 50-step euler solution "
                        "with ~16-25 steps")
    p.add_argument("--init_from", default=None, metavar="PATH",
                   help="warm-start params/EMA from a reference-format "
                        "torch checkpoint (.pth file or reference "
                        "experiment dir); optimizer state starts fresh")
    p.add_argument("--spk_encoder", default=None, metavar="PT",
                   help="test action: path to resemblyzer's pretrained.pt "
                        "— enables the real speaker-cosine metric via the "
                        "built-in torch-twin-verified GE2E encoder "
                        "(eval/speaker.py) when the resemblyzer package "
                        "is absent")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX backend (some TPU plugins ignore the "
                        "JAX_PLATFORMS env var; this flag does not)")
    return p.parse_args()


def warm_start_state(state, model, path: str):
    """Replace params/EMA (+ BN/VQ collections) in a fresh TrainState with
    weights converted from a reference torch checkpoint — fine-tune
    reference-trained models on TPU without a conversion step.
    reference checkpoint format: DEX-TTS/src/train.py:112-122."""
    from dex_tts_tpu.convert import (
        dex_tts_torch_to_flax,
        load_torch_trainer_checkpoint,
    )
    from dex_tts_tpu.eval.evaluation import _find_torch_tts_checkpoint

    # "best-train" already falls back through val-best and last
    resolved = _find_torch_tts_checkpoint(path, "best-train")
    if not resolved:
        raise FileNotFoundError(f"no reference checkpoint found at {path}")
    sd, ema_sd = load_torch_trainer_checkpoint(resolved)  # one disk read
    variables = dex_tts_torch_to_flax(sd, model)
    ema_params = (
        dex_tts_torch_to_flax(ema_sd, model)["params"]
        if ema_sd is not None
        else variables["params"]
    )
    print(f"warm start from {resolved}")
    return state.replace(
        params=variables["params"],
        ema_params=ema_params,
        batch_stats=variables.get("batch_stats", state.batch_stats),
        vq_stats=variables.get("vq_stats", state.vq_stats),
    )


def make_loaders(cfg, args, process_count: int = 1, process_index: int = 0):
    load_style = cfg.get("model_family", "dex") == "dex"
    common = dict(
        cmu_path=cfg.path.get("cmu_path"),
        add_blank=cfg.model.get("add_blank", True),
        load_style=load_style,
        aug_types=tuple(cfg.train.get("aug_type", ["N", "N", "N"])),
        seed=args.seed,
    )
    train_ds = TextMelDataset(cfg.path.train_path, **common)
    val_ds = TextMelDataset(cfg.path.val_path, **common)
    bq = dict(
        batch_size=cfg.train.batch_size,
        x_quantum=cfg.train.get("x_quantum", 32),
        y_quantum=cfg.train.get("y_quantum", 64),
        seed=args.seed,
        process_count=process_count,
        process_index=process_index,
    )
    return (
        lambda: BucketBatcher(train_ds, shuffle=True, **bq),
        lambda: BucketBatcher(val_ds, shuffle=False, **bq),
        train_ds,
        val_ds,
    )


def compute_out_size(cfg) -> int | None:
    """Training mel segment length: fix_len s of audio, rounded for the
    U-Net (reference: DEX-TTS/main.py:61-64 — 2 s ⇒ 172 frames)."""
    if not cfg.train.get("out_size", True):
        return None
    pre = cfg.preprocess
    return fix_len_compatibility(
        int(cfg.train.get("fix_len", 2) * pre.sample_rate / pre.hop_length)
    )


def make_synthesis_callback(cfg, model, args, n_samples: int = 2):
    """Periodic train-time synthesis (reference: DEX-TTS/src/train.py:176-178
    runs a Tester every syn_every epochs). Writes wavs + mel-MAE into
    exp_dir/sample."""
    from dex_tts_tpu.audio.wav import write_wav
    from dex_tts_tpu.data import TextMelDataset
    from dex_tts_tpu.eval.evaluation import load_vocoder
    from dex_tts_tpu.eval.metric import mel_mae
    from dex_tts_tpu.models.edm import SamplerConfig
    from dex_tts_tpu.pipeline import Synthesizer

    # dataset / vocoder / Synthesizer (and its compiled bucket graphs) are
    # built once and cached across invocations; each callback only swaps the
    # current weights in, avoiding a full re-jit every syn_every epochs
    cache: dict = {}

    def syn_fn(state, epoch):
        try:
            if "synth" not in cache:
                cache["ds"] = TextMelDataset(
                    cfg.path.val_path,
                    cmu_path=cfg.path.get("cmu_path"),
                    add_blank=cfg.model.get("add_blank", True),
                    load_style=cfg.get("model_family", "dex") == "dex",
                )
                voc, voc_params = load_vocoder(cfg)
                cache["synth"] = Synthesizer(
                    model, {}, vocoder=voc, vocoder_params=voc_params,
                    cmu_path=cfg.path.get("cmu_path"),
                    sampler=SamplerConfig(
                        num_steps=args.n_timesteps, solver=args.solver
                    ),
                )
            ds = cache["ds"]
            synth = cache["synth"]
            synth.set_variables({
                "params": state.params,
                "batch_stats": state.batch_stats,
                "vq_stats": state.vq_stats,
            })
            out_dir = os.path.join(cfg.exp_dir, "sample")
            os.makedirs(out_dir, exist_ok=True)
            for i in range(min(n_samples, len(ds))):
                item = ds.eval_item(i)
                kwargs = {}
                if "ref" in item:
                    kwargs["ref_feats"] = [(item["ref"], item["lf0"])]
                out = synth.tts(
                    [item["raw_text"]], key=jax.random.PRNGKey(i), **kwargs
                )[0]
                write_wav(
                    os.path.join(out_dir, f"epoch{epoch}_{i}.wav"), out["wav"]
                )
                mae = mel_mae(item["y"], out["mel"])
                print(f"  syn sample {i}: mel_mae={mae:.4f}")
        except Exception as exc:  # pragma: no cover - best-effort monitoring
            print(f"  periodic synthesis failed: {exc}")

    return syn_fn


def train(args):
    from dex_tts_tpu import parallel

    # multi-host runtime: no-op single-process; forms the global device set
    # when JAX_PROCESS_COUNT>1 (must precede first backend use)
    parallel.initialize()

    cfg = Config(args.config)
    seed_init(args.seed)
    if getattr(args, "compile_cache", None):
        from dex_tts_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache(args.compile_cache)
    set_experiment(cfg, tag=args.tag)
    model = build_model(cfg)
    out_size = compute_out_size(cfg)

    if jax.process_count() > 1:
        # multi-host: every host contributes all its chips; truncation would
        # leave hosts with unequal device counts and break the equal
        # per-process batch split
        n_devices = len(jax.devices())
        assert int(cfg.train.batch_size) % n_devices == 0, (
            f"batch_size {cfg.train.batch_size} must divide evenly over "
            f"{n_devices} devices in multi-host runs"
        )
    else:
        n_devices = args.n_devices or len(jax.devices())
        # dp requires the global batch to divide evenly across devices
        while n_devices > 1 and int(cfg.train.batch_size) % n_devices:
            n_devices -= 1
    mesh = parallel.make_mesh(n_devices) if n_devices > 1 else None
    train_loader_fn, valid_loader_fn, train_ds, _ = make_loaders(
        cfg, args,
        process_count=jax.process_count(),
        process_index=jax.process_index(),
    )
    # init shapes only — a prefetch-free batcher avoids spinning up the
    # background thread and loading extra batches just to take the first
    init_batch = next(
        iter(
            BucketBatcher(
                train_ds,
                batch_size=cfg.train.batch_size,
                x_quantum=cfg.train.get("x_quantum", 32),
                y_quantum=cfg.train.get("y_quantum", 64),
                seed=args.seed,
                process_count=jax.process_count(),
                process_index=jax.process_index(),
                prefetch=0,
            )
        )
    )
    state, tx = create_train_state(
        model,
        init_batch,
        seed=args.seed,
        lr=float(cfg.train.lr),
        max_grad=float(cfg.train.get("max_grad", 1.0)),
        out_size=out_size,
    )
    if getattr(args, "init_from", None):
        state = warm_start_state(state, model, args.init_from)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    print(f"model params: {n_params / 1e6:.2f} M | out_size: {out_size}")

    syn_fn = make_synthesis_callback(cfg, model, args)
    # SIGTERM (pod maintenance/reclaim) → checkpoint + clean exit; resume
    # with --resume (see train/preemption.py)
    guard = PreemptionGuard()
    trainer = Trainer(
        model,
        state,
        tx,
        exp_dir=cfg.exp_dir,
        out_size=out_size,
        ema_decay=float(cfg.train.get("ema_decay", 0.9999)),
        mask_ratio=float(cfg.train.get("mask_ratio", 0.0)),
        accum_steps=int(cfg.train.get("accum_steps", 1)),
        save_epoch=int(cfg.train.get("save_epoch", 200)),
        syn_every=int(cfg.train.get("syn_every", 0)),
        syn_fn=syn_fn,
        mesh=mesh,
        preemption=guard,
        async_ckpt=bool(cfg.train.get("async_ckpt", False)),
    )
    if args.resume and trainer.ckpt.exists("last"):
        restored = trainer.ckpt.restore(state, "last")
        # restore targets the unreplicated template; re-replicate over the
        # mesh or the first sharded step sees incompatible device commitments
        trainer.state = (
            parallel.replicate_state(restored, mesh) if mesh else restored
        )
        print(f"resumed from step {int(trainer.state.step)}")
    try:
        trainer.fit(
            train_loader_fn, valid_loader_fn, epochs=int(cfg.train.epoch)
        )
    finally:
        # give SIGINT/SIGTERM back to the previous handlers: only fit()
        # polls the guard, and in-process callers (tests, notebooks) must
        # keep a working Ctrl-C after train() returns
        guard.restore()


def test(args):
    from dex_tts_tpu.eval.evaluation import run_objective_eval

    cfg = Config(args.config)
    seed_init(args.seed)
    run_objective_eval(
        cfg,
        exp_dir=args.test_checkpoint,
        sample_size=args.sample_size,
        n_timesteps=args.n_timesteps,
        test_file=args.test_file,
        dit_cache_interval=args.dit_cache_interval,
        solver=args.solver,
        spk_encoder=args.spk_encoder,
    )


if __name__ == "__main__":
    a = parse_args()
    if getattr(a, "platform", None):
        jax.config.update("jax_platforms", a.platform)
    if a.action == "train":
        train(a)
    else:
        test(a)
