"""Vocoder GAN training: HiFi-GAN / BigVGAN generator + MPD/MRD critics.

The reference ships the discriminators and GAN losses untrained
(reference: DEX-TTS/bigvgan/models.py:221-400 — "not in any call path";
its vocoders are inference-only, loaded from upstream checkpoints). This
module closes that loop with the upstream HiFi-GAN/BigVGAN recipe
(AdamW(0.8, 0.99), exponential LR decay, LSGAN + feature-matching +
45·L1 mel loss), re-designed TPU-first:

- Both mel transforms (generator input and loss target) run **inside the
  jitted train step** on device — the host feeds raw waveform segments
  only (no offline mel, no CPU STFT in the loop).
- The discriminator and generator updates are one compiled program per
  step; all shapes are static (fixed segment length).
- State is one explicit pytree (`VocoderTrainState`) — orbax-checkpoints
  like the TTS `TrainState`, resume is bitwise-exact.
- Data parallelism reuses `parallel.make_parallel_train_step` (batch
  shards over `dp`, XLA all-reduces both optimizers' grads over ICI).

Weight normalization is deliberately dropped: the reference folds it away
at inference load time anyway (convert.py), and plain convs + global-norm
clipping train stably while keeping the conv kernels in the layout XLA
tiles best.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dex_tts_tpu.audio.stft import MelSpectrogram
from dex_tts_tpu.models.vocoder.discriminators import (
    DiscriminatorConfig,
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)


@flax.struct.dataclass
class VocoderTrainState:
    step: jnp.ndarray
    gen_params: Any
    gen_opt_state: Any
    disc_params: Any  # {"mpd": ..., "mrd": ...}
    disc_opt_state: Any


def make_vocoder_optimizer(
    lr: float = 2e-4,
    lr_decay: float = 0.999,
    steps_per_epoch: int = 1000,
    b1: float = 0.8,
    b2: float = 0.99,
) -> optax.GradientTransformation:
    """AdamW(0.8, 0.99) with per-epoch exponential decay — the upstream
    HiFi-GAN/BigVGAN schedule (ExponentialLR gamma=0.999), stepped per
    optimizer update via a staircase schedule."""
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=max(1, steps_per_epoch),
        decay_rate=lr_decay,
        staircase=True,
    )
    return optax.chain(
        optax.clip_by_global_norm(1000.0),  # safety net only, as upstream
        optax.adamw(schedule, b1=b1, b2=b2, weight_decay=0.01),
    )


def create_vocoder_train_state(
    generator,
    wav_batch: jnp.ndarray,
    mel: MelSpectrogram,
    disc_cfg: DiscriminatorConfig = DiscriminatorConfig(),
    gen_tx: optax.GradientTransformation | None = None,
    disc_tx: optax.GradientTransformation | None = None,
    seed: int = 100,
):
    """Initialize generator + MPD/MRD params from one (B, S) wav batch.

    Returns (state, gen_tx, disc_tx, (mpd, mrd)). Param init is jitted —
    eager init over the remote-TPU tunnel dispatches thousands of tiny
    ops (CLAUDE.md)."""
    gen_tx = gen_tx or make_vocoder_optimizer()
    disc_tx = disc_tx or make_vocoder_optimizer()
    mpd = MultiPeriodDiscriminator(disc_cfg)
    mrd = MultiResolutionDiscriminator(disc_cfg)
    hop = mel.hop_length

    @jax.jit
    def _init(wav):
        mel_in = mel(wav)[0][:, :, : wav.shape[1] // hop]
        k_g, k_p, k_r = jax.random.split(jax.random.PRNGKey(seed), 3)
        gen_params = generator.init(k_g, mel_in)["params"]
        fake = generator.apply({"params": gen_params}, mel_in)
        return (
            gen_params,
            mpd.init(k_p, wav, fake)["params"],
            mrd.init(k_r, wav, fake)["params"],
        )

    gen_params, mpd_params, mrd_params = _init(wav_batch)
    disc_params = {"mpd": mpd_params, "mrd": mrd_params}
    state = VocoderTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        gen_opt_state=gen_tx.init(gen_params),
        disc_params=disc_params,
        disc_opt_state=disc_tx.init(disc_params),
    )
    return state, gen_tx, disc_tx, (mpd, mrd)


def make_vocoder_train_step(
    generator,
    mpd: MultiPeriodDiscriminator,
    mrd: MultiResolutionDiscriminator,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    mel_input: MelSpectrogram,
    mel_loss: MelSpectrogram | None = None,
    lambda_mel: float = 45.0,
):
    """One GAN step on a (B, S) waveform batch: discriminator update on
    the frozen generator output, then generator update against the
    *updated* critics (upstream ordering). S must be a multiple of the
    mel hop. ``mel_loss`` defaults to ``mel_input`` (upstream uses a
    full-band variant for the L1 term — pass one to match)."""
    mel_loss = mel_loss or mel_input
    hop = mel_input.hop_length

    def step(state: VocoderTrainState, batch: dict):
        wav = batch["wav"]  # (B, S)
        if wav.shape[1] % hop:
            raise ValueError(
                f"segment length {wav.shape[1]} must be a multiple of the "
                f"mel hop {hop}: the generator upsamples exactly hop x "
                "frames, so real and fake waveforms would mismatch in the "
                "discriminators"
            )
        n_frames = wav.shape[1] // hop
        mel_in = mel_input(wav)[0][:, :, :n_frames]
        mel_target = mel_loss(wav)[0]

        # --- discriminator update (generator frozen) ------------------
        fake = jax.lax.stop_gradient(
            generator.apply({"params": state.gen_params}, mel_in)
        )

        def disc_loss_fn(dp):
            r_p, f_p, _, _ = mpd.apply({"params": dp["mpd"]}, wav, fake)
            loss_p, _, _ = discriminator_loss(r_p, f_p)
            r_r, f_r, _, _ = mrd.apply({"params": dp["mrd"]}, wav, fake)
            loss_r, _, _ = discriminator_loss(r_r, f_r)
            return loss_p + loss_r

        loss_d, d_grads = jax.value_and_grad(disc_loss_fn)(state.disc_params)
        d_updates, disc_opt_state = disc_tx.update(
            d_grads, state.disc_opt_state, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # --- generator update (against updated critics) ---------------
        def gen_loss_fn(gp):
            fake = generator.apply({"params": gp}, mel_in)
            mel_fake = mel_loss(fake)[0]
            l_mel = jnp.mean(jnp.abs(mel_fake - mel_target))
            _, f_p, fmap_rp, fmap_gp = mpd.apply(
                {"params": disc_params["mpd"]}, wav, fake
            )
            _, f_r, fmap_rr, fmap_gr = mrd.apply(
                {"params": disc_params["mrd"]}, wav, fake
            )
            adv_p, _ = generator_loss(f_p)
            adv_r, _ = generator_loss(f_r)
            fm = feature_loss(fmap_rp, fmap_gp) + feature_loss(fmap_rr, fmap_gr)
            total = adv_p + adv_r + fm + lambda_mel * l_mel
            return total, {"loss_mel": l_mel, "loss_adv": adv_p + adv_r,
                           "loss_fm": fm}

        (loss_g, aux), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params
        )
        g_updates, gen_opt_state = gen_tx.update(
            g_grads, state.gen_opt_state, state.gen_params
        )
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        metrics = {"loss_disc": loss_d, "loss_gen": loss_g, **aux}
        return (
            state.replace(
                step=state.step + 1,
                gen_params=gen_params,
                gen_opt_state=gen_opt_state,
                disc_params=disc_params,
                disc_opt_state=disc_opt_state,
            ),
            metrics,
        )

    return step
