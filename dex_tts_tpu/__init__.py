"""DEX-TTS-TPU: a TPU-native diffusion TTS framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
winddori2002/DEX-TTS (expressive diffusion TTS with time-variability style
modeling) and GeDEX-TTS (the general, reference-free variant).

Layer map (bottom → top):
  text/       pure-Python Tacotron-style text frontend (symbols, cleaners,
              CMUdict, number normalization — all self-contained)
  audio/      jittable DSP: framed-rfft STFT, Slaney mel filterbank, log-mel
  ops/        jittable core ops: sequence masks, alignment-path generation,
              on-device monotonic alignment search (lax.scan wavefront DP)
  models/     flax.linen model zoo: retention text encoder, U-Net+DiT
              denoiser, EDM loss/precond/sampler, style encoders/adaptors,
              HiFi-GAN / BigVGAN vocoders
  data/       host data pipeline: filelists, feature loading, bucketed
              collation for static XLA shapes
  train/      optax trainer, EMA, orbax checkpoints
  parallel/   device mesh + data-parallel sharding (pjit/NamedSharding)
  eval/       objective metrics (mel-MAE, optional CER/WER/cos-sim)

Reference behaviors are cited in docstrings as
``reference: DEX-TTS/<path>:<lines>`` relative to the upstream repo.
"""

__version__ = "0.1.0"
