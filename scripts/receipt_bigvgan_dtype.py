"""Trained-model BigVGAN bf16-vs-f32 quality receipt (VERDICT r4 item 3).

The previous bf16 quality case was the random-init chaos-floor argument
(whole-generator SNR vs f32 saturates ~16 dB for ANY perturbation because
an untrained GAN is chaotic through its tanh). This script replaces it
with a *trained-model* receipt:

1. Overfit-train the full-size BigVGAN generator on one deterministic
   speech-like clip until reconstruction converges. Default mode
   "supervised" (waveform-L1 + mel-L1, plain Adam): on a single clip
   this memorizes the waveform and yields the smooth generator the
   receipt needs. `--mode gan` uses the real GAN step from
   train/vocoder.py (MPD+MRD, LSGAN + FM + 45·L1-mel) — NB at 500
   steps from scratch the critics crush the generator into tanh
   saturation (gen≈419, all-±1 output, mel_l1 stuck ~8.2 — measured
   2026-08-20), which makes the dtype comparison vacuous (saturated
   outputs are bit-identical in every dtype); the script reports the
   saturation fraction so a vacuous run is visible.
2. Resynthesize the clip's mel with identical trained params under
   (a) f32 and (b) bfloat16 + fold snake (the serving knob bench.py's
   ``auto`` picks on TPU), and record
     - wav-domain SNR of bf16 vs f32 output,
     - mel-MAE of each resynthesis vs the target mel and vs each other
   — the quality column the ≤0.02 BigVGAN RTF claim rides on.

Run on the TPU (~10-20 min incl. compile): python scripts/receipt_bigvgan_dtype.py
  [--steps 500] [--segment 8192] [--batch 8]
(--smoke: tiny config on CPU, plumbing only.)

reference: DEX-TTS/bigvgan/activations.py:9-119 (the snake being
approximated in bf16), bigvgan/models.py:138-218.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

SMOKE = "--smoke" in sys.argv
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dex_tts_tpu.audio.stft import MelSpectrogram  # noqa: E402
from dex_tts_tpu.models.vocoder import (  # noqa: E402
    BigVGANConfig,
    BigVGANGenerator,
)
from dex_tts_tpu.models.vocoder.discriminators import (  # noqa: E402
    DiscriminatorConfig,
)
from dex_tts_tpu.train.vocoder import (  # noqa: E402
    create_vocoder_train_state,
    make_vocoder_optimizer,
    make_vocoder_train_step,
)

SR = 22050
HOP = 256


def speech_like_clip(seconds: float, seed: int = 0) -> np.ndarray:
    """Deterministic voiced-speech-like waveform: gliding f0 with a
    harmonic stack shaped by moving formant-ish amplitudes, a syllabic
    energy envelope, and a little noise floor. Enough spectral structure
    that overfitting it exercises every BigVGAN band."""
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    f0 = 140.0 + 60.0 * np.sin(2 * np.pi * 0.7 * t) + 20.0 * np.sin(
        2 * np.pi * 2.3 * t
    )
    phase = 2 * np.pi * np.cumsum(f0) / SR
    wav = np.zeros(n)
    for h in range(1, 24):
        amp = np.exp(-0.5 * ((h * 170.0 - 700.0) / 600.0) ** 2) + 0.4 * np.exp(
            -0.5 * ((h * 170.0 - 2400.0) / 800.0) ** 2
        )
        amp = amp / (1.0 + 0.15 * h)
        wob = 1.0 + 0.1 * np.sin(2 * np.pi * (0.9 + 0.13 * h) * t + h)
        wav += amp * wob * np.sin(h * phase)
    envelope = 0.25 + 0.75 * np.clip(
        np.sin(2 * np.pi * 3.1 * t) + 0.7, 0.0, 1.0
    )
    wav = wav * envelope + 0.01 * rng.standard_normal(n)
    wav = wav / np.max(np.abs(wav)) * 0.95
    return wav.astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3 if SMOKE else 500)
    p.add_argument("--segment", type=int, default=1024 if SMOKE else 8192)
    p.add_argument("--batch", type=int, default=2 if SMOKE else 8)
    p.add_argument("--seconds", type=float, default=0.4 if SMOKE else 2.0)
    p.add_argument("--mode", default="supervised",
                   choices=["supervised", "gan"])
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    if SMOKE:
        hop = 64
        cfg = BigVGANConfig(
            num_mels=8, upsample_rates=(4, 4, 2, 2),
            upsample_kernel_sizes=(8, 8, 4, 4),
            upsample_initial_channel=16,
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        )
        disc_cfg = DiscriminatorConfig(
            mpd_periods=(2, 3), mrd_resolutions=((64, 16, 32),),
            channel_mult=0.05,
        )
        mel = MelSpectrogram(n_fft=256, hop_length=hop, win_length=256,
                             n_mels=8, fmax=8000.0)
    else:
        hop = HOP
        cfg = BigVGANConfig(num_mels=80)  # the shipped full-size arch
        disc_cfg = DiscriminatorConfig()
        mel = MelSpectrogram(n_fft=1024, hop_length=hop, win_length=1024,
                             n_mels=80, fmax=8000.0)
    assert args.segment % hop == 0

    print(f"backend={jax.default_backend()} steps={args.steps} "
          f"segment={args.segment} batch={args.batch}", flush=True)
    clip = speech_like_clip(args.seconds)
    rng = np.random.default_rng(1)

    def sample_batch():
        starts = rng.integers(0, len(clip) - args.segment, size=args.batch)
        segs = np.stack([clip[s:s + args.segment] for s in starts])
        return {"wav": jnp.asarray(segs)}

    gen_f32 = BigVGANGenerator(cfg)
    t0 = time.time()
    if args.mode == "gan":
        gen_tx = make_vocoder_optimizer(steps_per_epoch=200)
        disc_tx = make_vocoder_optimizer(steps_per_epoch=200)
        state, gen_tx, disc_tx, (mpd, mrd) = create_vocoder_train_state(
            gen_f32, sample_batch()["wav"], mel, disc_cfg, gen_tx, disc_tx
        )
        step = jax.jit(
            make_vocoder_train_step(gen_f32, mpd, mrd, gen_tx, disc_tx, mel)
        )
        print(f"init in {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        for i in range(args.steps):
            state, metrics = step(state, sample_batch())
            if i == 0 or (i + 1) % 50 == 0 or i + 1 == args.steps:
                print(
                    f"step {i+1}: mel_l1={float(metrics['loss_mel']):.4f} "
                    f"gen={float(metrics['loss_gen']):.2f} "
                    f"disc={float(metrics['loss_disc']):.2f} "
                    f"({time.time()-t0:.0f}s)",
                    flush=True,
                )
        mel_l1_final = float(metrics["loss_mel"])
        gen_params = state.gen_params
    else:
        import optax

        hop_l = mel.hop_length

        @jax.jit
        def _init(wav):
            mel_in = mel(wav)[0][:, :, : wav.shape[1] // hop_l]
            return gen_f32.init(jax.random.PRNGKey(100), mel_in)["params"]

        gen_params = _init(sample_batch()["wav"])
        tx = optax.adam(args.lr)
        opt_state = tx.init(gen_params)

        def loss_fn(p, wav):
            n_fr = wav.shape[1] // hop_l
            mel_in = mel(wav)[0][:, :, :n_fr]
            fake = gen_f32.apply({"params": p}, mel_in)
            l_wav = jnp.mean(jnp.abs(fake - wav))
            l_mel = jnp.mean(jnp.abs(mel(fake)[0] - mel(wav)[0]))
            return 10.0 * l_wav + l_mel, (l_wav, l_mel)

        @jax.jit
        def sup_step(p, o, wav):
            (_, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p, wav)
            upd, o = tx.update(g, o, p)
            return optax.apply_updates(p, upd), o, aux

        print(f"init in {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        for i in range(args.steps):
            gen_params, opt_state, (l_wav, l_mel) = sup_step(
                gen_params, opt_state, sample_batch()["wav"]
            )
            if i == 0 or (i + 1) % 50 == 0 or i + 1 == args.steps:
                print(
                    f"step {i+1}: wav_l1={float(l_wav):.4f} "
                    f"mel_l1={float(l_mel):.4f} ({time.time()-t0:.0f}s)",
                    flush=True,
                )
        mel_l1_final = float(l_mel)

    # ---- resynthesis with the TRAINED params, f32 vs bf16(+fold) ----
    n_frames = len(clip) // hop
    wav_in = jnp.asarray(clip[: n_frames * hop])[None]
    mel_target = mel(wav_in)[0][:, :, :n_frames]

    def run(generator):
        f = jax.jit(
            lambda p, m: generator.apply({"params": p}, m)
        )
        out = f(gen_params, mel_target)
        return np.asarray(out, np.float32)[0]

    wav_f32 = run(gen_f32)
    import dataclasses

    gen_bf16 = BigVGANGenerator(dataclasses.replace(cfg, dtype="bfloat16"))
    wav_bf16 = run(gen_bf16)

    def mel_of(w):
        return np.asarray(mel(jnp.asarray(w)[None])[0])[:, :, :n_frames]

    m_f32, m_bf16 = mel_of(wav_f32), mel_of(wav_bf16)
    m_tgt = np.asarray(mel_target)
    err = wav_f32 - wav_bf16
    snr_db = 10 * np.log10(
        float(np.sum(wav_f32**2)) / max(float(np.sum(err**2)), 1e-20)
    )
    sat = float(np.mean(np.abs(wav_f32) > 0.99))
    out = {
        "metric": "BigVGAN bf16-vs-f32 on TRAINED generator "
                  f"(overfit {args.steps} {args.mode} steps, "
                  f"mel_l1 {mel_l1_final:.4f})",
        "saturated_frac": round(sat, 4),
        "snr_db_bf16_vs_f32": round(snr_db, 2),
        "max_abs_wav_err": round(float(np.max(np.abs(err))), 5),
        "mel_mae_f32_vs_target": round(float(np.mean(np.abs(m_f32 - m_tgt))), 5),
        "mel_mae_bf16_vs_target": round(float(np.mean(np.abs(m_bf16 - m_tgt))), 5),
        "mel_mae_bf16_vs_f32": round(float(np.mean(np.abs(m_bf16 - m_f32))), 5),
        "train_mel_l1_final": round(mel_l1_final, 4),
        "steps": args.steps,
        "backend": jax.default_backend(),
        "snake_impl_bf16": gen_bf16.cfg.snake_impl,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
