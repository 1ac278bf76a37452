"""Vocoder GAN training CLI (HiFi-GAN / BigVGAN generator + MPD/MRD).

The reference repo carries the discriminators and GAN losses but no
training loop (reference: DEX-TTS/bigvgan/models.py:221-400, unused);
this CLI trains/fine-tunes a vocoder on raw wavs — e.g. the trimmed wavs
the preprocessor writes — with both mel transforms fused into the jitted
step on device.

    python train_vocoder.py --data ./preprocessed/LJSpeech/wav \
        --vocoder hifigan --steps 100000 --ckpt_dir ckpt_hifigan

Multi-chip: add --n_devices N (data-parallel over the local mesh).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from dex_tts_tpu.audio.stft import MelSpectrogram
from dex_tts_tpu.data.vocoder_dataset import (
    WavSegmentDataset,
    wav_paths_from_source,
)
from dex_tts_tpu.models.vocoder import (
    BigVGANConfig,
    BigVGANGenerator,
    HiFiGANConfig,
    HiFiGANGenerator,
)
from dex_tts_tpu.models.vocoder.discriminators import DiscriminatorConfig
from dex_tts_tpu.train.checkpoint import CheckpointManager
from dex_tts_tpu.train.vocoder import (
    create_vocoder_train_state,
    make_vocoder_optimizer,
    make_vocoder_train_step,
)


def warm_start_generator(state, gen, gen_tx, vocoder_kind: str,
                         path: str):
    """Replace the generator params in a fresh vocoder train state with a
    released torch checkpoint's weights (weight norm folded) — fine-tune
    HiFi-GAN/BigVGAN on your own data; critics/optimizer start fresh."""
    from dex_tts_tpu.convert import (
        bigvgan_torch_to_flax,
        hifigan_torch_to_flax,
        load_torch_checkpoint,
    )

    convert = (
        hifigan_torch_to_flax
        if vocoder_kind == "hifigan"
        else bigvgan_torch_to_flax
    )
    gen_params = convert(load_torch_checkpoint(path), gen.cfg)
    return state.replace(
        gen_params=gen_params,
        gen_opt_state=gen_tx.init(gen_params),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True,
                   help="wav directory or TTS filelist")
    p.add_argument("--config", default=None,
                   help="TTS preset yaml: the vocoder trains on the SAME "
                        "mel parameters (preprocess section) the TTS "
                        "pipeline will feed it at serving time")
    p.add_argument("--vocoder", choices=["hifigan", "bigvgan"],
                   default="hifigan")
    p.add_argument("--segment", type=int, default=8192)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lr_decay", type=float, default=0.999)
    p.add_argument("--steps_per_epoch", type=int, default=1000)
    p.add_argument("--lambda_mel", type=float, default=45.0)
    p.add_argument("--sample_rate", type=int, default=22050)
    p.add_argument("--cache_gb", type=float, default=2.0,
                   help="decoded-audio host cache bound (0 disables)")
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--ckpt_dir", default="ckpt_vocoder")
    p.add_argument("--save_every", type=int, default=5000)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init_gen", default=None, metavar="PATH",
                   help="warm-start the generator from a released "
                        "torch checkpoint (.pth/.pth.tar[.zip]) — "
                        "fine-tune HiFi-GAN/BigVGAN weights on your "
                        "own data; critics/optimizer start fresh")
    p.add_argument("--n_devices", type=int, default=0,
                   help="data-parallel device count (0 = single device)")
    args = p.parse_args()

    # mel parameters must match what the TTS pipeline feeds the vocoder
    # at serving time — read them from the preset when given
    mel_kw = dict(sample_rate=args.sample_rate)
    n_mels = 80
    if args.config:
        from dex_tts_tpu.utils import Config

        pre = Config(args.config).preprocess
        mel_kw = dict(
            n_fft=int(pre.get("n_fft", 1024)),
            hop_length=int(pre.get("hop_length", 256)),
            win_length=int(pre.get("win_length", 1024)),
            n_mels=int(pre.get("n_mels", 80)),
            sample_rate=int(pre.get("sample_rate", args.sample_rate)),
            fmin=float(pre.get("f_min", 0.0)),
            fmax=float(pre.get("f_max", 8000.0)),
        )
        n_mels = mel_kw["n_mels"]
        args.sample_rate = mel_kw["sample_rate"]

    gen = (
        HiFiGANGenerator(HiFiGANConfig(num_mels=n_mels))
        if args.vocoder == "hifigan"
        else BigVGANGenerator(BigVGANConfig(num_mels=n_mels))
    )
    mel = MelSpectrogram(**mel_kw)
    up = 1
    for r in gen.cfg.upsample_rates:
        up *= r
    if up != mel.hop_length:
        p.error(
            f"generator upsamples x{up} but the mel hop is "
            f"{mel.hop_length}; pick matching upsample_rates/hop"
        )
    if args.segment % mel.hop_length:
        p.error(
            f"--segment {args.segment} must be a multiple of the mel hop "
            f"({mel.hop_length})"
        )
    # full-band mel for the L1 term (upstream fmax_for_loss: null)
    mel_l1 = MelSpectrogram(
        **{**mel_kw, "fmax": args.sample_rate / 2}
    )

    data = WavSegmentDataset(
        wav_paths_from_source(args.data),
        segment=args.segment,
        sample_rate=args.sample_rate,
        seed=args.seed,
        cache_bytes=int(args.cache_gb * (1 << 30)),
    )
    print(f"{len(data)} wav files from {args.data}")

    tx = lambda: make_vocoder_optimizer(
        args.lr, args.lr_decay, args.steps_per_epoch
    )
    init_batch = next(data.batches(args.batch, 1))
    state, gen_tx, disc_tx, (mpd, mrd) = create_vocoder_train_state(
        gen, init_batch["wav"], mel,
        DiscriminatorConfig(),
        gen_tx=tx(), disc_tx=tx(), seed=args.seed,
    )
    if args.init_gen:
        state = warm_start_generator(
            state, gen, gen_tx, args.vocoder, args.init_gen
        )
        print(f"generator warm start from {args.init_gen}")

    step_fn = make_vocoder_train_step(
        gen, mpd, mrd, gen_tx, disc_tx, mel, mel_l1,
        lambda_mel=args.lambda_mel,
    )

    if args.n_devices:
        from dex_tts_tpu.parallel import make_mesh, make_parallel_train_step

        mesh = make_mesh(n_devices=args.n_devices)
        step_fn = make_parallel_train_step(step_fn, mesh)
        from dex_tts_tpu.parallel.mesh import replicate_state

        state = replicate_state(state, mesh)
    else:
        step_fn = jax.jit(step_fn, donate_argnums=(0,))

    ckpt = CheckpointManager(args.ckpt_dir)
    if args.resume and ckpt.exists("last"):
        state = ckpt.restore(state, "last")
        print(f"resumed at step {int(state.step)}")

    from dex_tts_tpu.train import PreemptionGuard

    guard = PreemptionGuard()  # SIGTERM/SIGINT → save + clean exit

    # track the step count host-side: int(state.step) per iteration would
    # add a ~30 ms device round-trip per step on the remote-TPU link
    start = int(state.step)
    t0, last_log = time.time(), start
    try:
        for i, batch in enumerate(
            data.batches(args.batch, args.steps - start), 1
        ):
            if guard.triggered:
                print("preempted: saving checkpoint and exiting", flush=True)
                # same tag contract as Trainer.fit (train/preemption.py)
                ckpt.save(state, "preempt")
                break
            state, metrics = step_fn(state, batch)
            n = start + i
            if n % args.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t0
                rate = (n - last_log) / dt if dt > 0 else 0.0
                print(json.dumps({"step": n, "steps_per_sec": round(rate, 3),
                                  **{k: round(v, 4) for k, v in m.items()}}),
                      flush=True)
                t0, last_log = time.time(), n
            if n % args.save_every == 0:
                ckpt.save(state, "last")
                ckpt.save(state, f"step_{n}")
                # serving handoff: raw generator params, restorable by
                # eval.load_vocoder via path.vocoder_path = ckpt_dir
                ckpt.save(state.gen_params, "gen_last")
        ckpt.save(state, "last")
        ckpt.save(state.gen_params, "gen_last")
        print(f"done at step {int(state.step)}")
    finally:
        guard.restore()  # keep Ctrl-C working for in-process callers


if __name__ == "__main__":
    main()
