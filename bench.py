"""Benchmark: end-to-end synthesis RTF per chip at 50 EDM steps.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
Baseline (BASELINE.md / BASELINE.json north star): end-to-end synthesis
RTF ≤ 0.02 per chip on TPU v5e at 50 diffusion steps. vs_baseline =
0.02 / measured_RTF, so > 1.0 means faster than the target.

The headline metric runs text→mel→WAV in ONE jit graph: the flagship
DeX-TTS at the reference VCTK scale (reference: DEX-TTS/config/VCTK/
base.yaml) with the HiFi-GAN vocoder fused in (BASELINE config 4;
reference synthesis path: DEX-TTS/src/evaluation.py:88-149). The
text→mel-only RTF is reported alongside. Batch 16, ~8.9 s of audio per
item (768 frames @ 256 hop / 22.05 kHz — long-sentence regime). Weights
are randomly initialized — wall-clock is weight-independent. All tensors
are jit arguments with random values (no constant folding).
"""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _full_size_dex, _full_size_gedex, _style_inputs
from dex_tts_tpu.models.edm import SamplerConfig
from dex_tts_tpu.models.vocoder import (
    BigVGANConfig,
    BigVGANGenerator,
    HiFiGANConfig,
    HiFiGANGenerator,
)

SAMPLE_RATE = 22050
HOP = 256
N_STEPS = 50


from dex_tts_tpu.utils.timing import time_fn


def _time(fn, *args):
    return time_fn(fn, *args, iters=3, assert_finite=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vocoder", choices=["hifigan", "bigvgan"],
                   default="hifigan")
    p.add_argument("--family", choices=["dex", "gedex"], default="dex")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of one timed e2e "
                        "iteration into DIR (TensorBoard/Perfetto)")
    p.add_argument("--dit_cache", type=int, default=1, metavar="K",
                   help="approximate turbo sampling (DiT mid-block reused "
                        "for K-1 of every K steps); 1 = exact (the "
                        "headline benchmark is always exact)")
    p.add_argument("--solver", default="euler",
                   choices=["euler", "heun", "dpmpp2m"],
                   help="ODE solver (the headline benchmark is always the "
                        "reference's 50-step euler)")
    p.add_argument("--steps", type=int, default=N_STEPS,
                   help="sampler steps (headline: 50); pair with "
                        "--solver dpmpp2m for the few-step regime")
    p.add_argument("--snake_impl", default="auto",
                   choices=["auto", "polyphase", "fold", "pallas"],
                   help="BigVGAN snake lowering (ops/snake.py); 'auto' "
                        "picks the measured winner per dtype (fold for "
                        "bf16, polyphase for f32), 'fold' forces the "
                        "fused full-lane TPU kernel")
    p.add_argument("--upsample_impl", default="conv_transpose",
                   choices=["conv_transpose", "subpixel"],
                   help="vocoder upsampler lowering (see vocoder/upsample.py)")
    p.add_argument("--conv_impl", default="auto",
                   choices=["auto", "plain", "packed"],
                   help="BigVGAN AMP conv lowering (vocoder/packing.py): "
                        "auto = packed iff TPU and stage dtype != f32")
    p.add_argument("--vocoder_dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="vocoder compute dtype; 'auto' picks the measured "
                        "winner per generator: bfloat16 for BigVGAN "
                        "(fold-snake bf16 is the fastest variant, 1259 vs "
                        "1511 ms f32 — kernel exactness receipt: "
                        "scripts/validate_fold.py f64 oracle), float32 for "
                        "HiFi-GAN (adds only ~0.0011 RTF)")
    args = p.parse_args()
    if args.dit_cache > 1 and args.steps % args.dit_cache:
        p.error(
            f"--dit_cache {args.dit_cache} must divide {args.steps} steps"
        )
    if args.solver != "euler" and args.dit_cache > 1:
        p.error("--dit_cache requires the euler solver")

    b, tx, ty, t_ref = args.batch, 96, 768, 256
    # flash blocks default to 1024 (padding-aware auto selection), which
    # already fits the scoped-vmem budget with BigVGAN fused in the graph
    dex = args.family == "dex"
    model = _full_size_dex() if dex else _full_size_gedex()
    family_cls = type(model)
    x = jnp.asarray(
        np.random.default_rng(1).integers(1, 148, (b, tx)), jnp.int32
    )
    x_lengths = jnp.full((b,), tx, jnp.int32)
    # GeDEX takes no reference-speech conditioning
    style = _style_inputs(b, 80, t_ref) if dex else {}

    if args.vocoder_dtype == "auto":
        voc_dtype = "bfloat16" if args.vocoder == "bigvgan" else "float32"
    else:
        voc_dtype = args.vocoder_dtype
    if args.vocoder == "bigvgan":
        vocoder = BigVGANGenerator(
            BigVGANConfig(
                num_mels=80, snake_impl=args.snake_impl, dtype=voc_dtype,
                upsample_impl=args.upsample_impl,
                conv_impl=args.conv_impl,
            )
        )
    else:
        vocoder = HiFiGANGenerator(
            HiFiGANConfig(
                num_mels=80, dtype=voc_dtype,
                upsample_impl=args.upsample_impl,
            )
        )

    @jax.jit
    def _init():
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jax.random.PRNGKey(2),
            x,
            x_lengths,
            y_max_length=ty,
            sampler=SamplerConfig(num_steps=2),
            **style,
            method=family_cls.synthesize,
        )
        voc_params = vocoder.init(
            jax.random.PRNGKey(3), jnp.zeros((1, 80, 16))
        )["params"]
        return variables, voc_params

    variables, voc_params = _init()

    def _make_synth(unroll=None):
        def _synth(variables, key, x, x_lengths, *style_args):
            cond = {}
            if style_args:
                (cond["ref"], cond["ref_lengths"], cond["sty"],
                 cond["sty_lengths"], cond["lf0"],
                 cond["lf0_lengths"]) = style_args
            sampler = SamplerConfig(
                num_steps=args.steps, solver=args.solver,
                dit_cache_interval=args.dit_cache,
            )
            if unroll is not None:
                import dataclasses

                sampler = dataclasses.replace(sampler, unroll=unroll)
            return model.apply(
                variables,
                key,
                x,
                x_lengths,
                y_max_length=ty,
                sampler=sampler,
                temperature=1.5,
                length_scale=1.0,
                method=family_cls.synthesize,
                **cond,
            )
        return _synth

    _synth = _make_synth()

    @jax.jit
    def text_to_mel(variables, key, *args):
        return _synth(variables, key, *args)[1]

    @jax.jit
    def text_to_wav(variables, voc_params, key, *args):
        mel = _synth(variables, key, *args)[1]
        return vocoder.apply({"params": voc_params}, mel)

    # FLOPs twins at unroll 1/2: cost_analysis counts a loop body once
    # per unroll copy, so two cheap lowerings extrapolate the full
    # `steps`-iteration count (utils/mfu.py). Only lowered, never run.
    def _mel_flops_twin(u):
        s = _make_synth(unroll=u)
        return jax.jit(lambda variables, key, *a: s(variables, key, *a)[1])

    def _wav_flops_twin(u):
        s = _make_synth(unroll=u)
        return jax.jit(
            lambda variables, voc_params, key, *a: vocoder.apply(
                {"params": voc_params}, s(variables, key, *a)[1]
            )
        )

    inputs = (x, x_lengths) + (
        (
            style["ref"], style["ref_lengths"], style["sty"],
            style["sty_lengths"], style["lf0"], style["lf0_lengths"],
        )
        if dex
        else ()
    )
    key = jax.random.PRNGKey(4)

    audio_seconds = b * ty * HOP / SAMPLE_RATE
    mel_s = _time(text_to_mel, variables, key, *inputs)
    wav_s = _time(text_to_wav, variables, voc_params, key, *inputs)
    if args.profile:
        from dex_tts_tpu.utils.profiling import trace

        with trace(args.profile):
            jnp.sum(text_to_wav(variables, voc_params, key, *inputs)).block_until_ready()
    rtf_mel = mel_s / audio_seconds
    rtf_e2e = wav_s / audio_seconds

    # MFU accounting (VERDICT r2 item 2): analytical FLOPs from lowered
    # unroll-extrapolated twins / measured wall / chip bf16 peak
    from dex_tts_tpu.utils.mfu import (
        extrapolated_scan_flops,
        mfu,
        peak_flops_per_chip,
    )

    flops_e2e = extrapolated_scan_flops(
        _wav_flops_twin, args.steps, variables, voc_params, key, *inputs,
        compile_fallback=True,
    )
    flops_mel = extrapolated_scan_flops(
        _mel_flops_twin, args.steps, variables, key, *inputs,
        compile_fallback=True,
    )
    mfu_e2e = mfu(flops_e2e, wav_s)
    mfu_mel = mfu(flops_mel, mel_s)

    print(
        json.dumps(
            {
                "metric": (
                    f"end-to-end {args.family} text-to-WAV synthesis RTF per chip "
                    f"({args.steps}-step {args.solver} EDM + fused {args.vocoder}, "
                    f"batch {b}, {ty} frames/item"
                    + (
                        f", APPROX dit-cache {args.dit_cache}"
                        if args.dit_cache > 1
                        else ""
                    )
                    + ")"
                ),
                "value": round(rtf_e2e, 6),
                "unit": "RTF (wall s / audio s)",
                "vs_baseline": round(0.02 / rtf_e2e, 3),
                "text_to_mel_rtf": round(rtf_mel, 6),
                "vocoder_overhead_rtf": round(rtf_e2e - rtf_mel, 6),
                # MFU vs the chip's dense bf16 peak (conservative for the
                # f32 vocoder portion); null off-TPU or if the backend
                # exposes no flops estimate
                "tflops_per_dispatch": (
                    round(flops_e2e / 1e12, 3) if flops_e2e else None
                ),
                "mfu": round(mfu_e2e, 4) if mfu_e2e else None,
                "mfu_text_to_mel": round(mfu_mel, 4) if mfu_mel else None,
                "peak_tflops": (
                    round(peak_flops_per_chip() / 1e12, 1)
                    if peak_flops_per_chip()
                    else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
