"""Benchmark: end-to-end text→mel synthesis RTF per chip at 50 EDM steps.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md / BASELINE.json north star): RTF ≤ 0.02 per chip on
TPU v5e at 50 diffusion steps. vs_baseline = 0.02 / measured_RTF, so > 1.0
means faster than the target.

Runs the flagship DeX-TTS at the reference VCTK scale
(reference: DEX-TTS/config/VCTK/base.yaml), batch 16, ~8.9 s of audio per
item (768 frames @ 256 hop / 22.05 kHz — long-sentence regime). Weights are
randomly initialized — wall-clock is weight-independent.
"""

import json
import time

import jax
import jax.numpy as jnp

from __graft_entry__ import _full_size_dex, _style_inputs
from dex_tts_tpu.models.edm import SamplerConfig
from dex_tts_tpu.models.tts import DeXTTS

SAMPLE_RATE = 22050
HOP = 256
N_STEPS = 50


def main():
    b, tx, ty, t_ref = 16, 96, 768, 256
    model = _full_size_dex()
    x = jnp.ones((b, tx), jnp.int32)
    x_lengths = jnp.full((b,), tx, jnp.int32)
    style = _style_inputs(b, 80, t_ref)

    @jax.jit
    def _init():
        return model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jax.random.PRNGKey(2),
            x,
            x_lengths,
            y_max_length=ty,
            sampler=SamplerConfig(num_steps=2),
            **style,
            method=DeXTTS.synthesize,
        )

    variables = _init()

    @jax.jit
    def synth(variables, key, x, x_lengths, ref, ref_lengths, sty,
              sty_lengths, lf0, lf0_lengths):
        return model.apply(
            variables,
            key,
            x,
            x_lengths,
            y_max_length=ty,
            sampler=SamplerConfig(num_steps=N_STEPS),
            temperature=1.5,
            length_scale=1.0,
            ref=ref,
            ref_lengths=ref_lengths,
            sty=sty,
            sty_lengths=sty_lengths,
            lf0=lf0,
            lf0_lengths=lf0_lengths,
            method=DeXTTS.synthesize,
        )

    args = (
        jax.random.PRNGKey(3),
        x,
        x_lengths,
        style["ref"],
        style["ref_lengths"],
        style["sty"],
        style["sty_lengths"],
        style["lf0"],
        style["lf0_lengths"],
    )

    # warmup / compile. NB: materialize a scalar on host each iteration —
    # on the remote-TPU (axon) backend block_until_ready alone does not
    # guarantee remote completion.
    out = synth(variables, *args)
    float(jnp.sum(out[1]))

    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = synth(variables, *args)
        float(jnp.sum(out[1]))
    elapsed = (time.perf_counter() - t0) / n_iters

    audio_seconds = b * ty * HOP / SAMPLE_RATE
    rtf = elapsed / audio_seconds
    print(
        json.dumps(
            {
                "metric": f"text-to-mel synthesis RTF per chip ({N_STEPS}-step EDM, batch {b}, {ty} frames/item)",
                "value": round(rtf, 6),
                "unit": "RTF (wall s / audio s)",
                "vs_baseline": round(0.02 / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
