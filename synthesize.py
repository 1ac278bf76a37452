"""One-shot synthesis CLI.

Usage (mirrors reference: DEX-TTS/synthesize.py:115-138 and
GeDEX-TTS/synthesize.py:32-73):

  # expressive (style from reference wavs):
  python synthesize.py --config dex_tts_tpu/config/presets/vctk.yaml \
      --weight_path checkpoints/VCTK-0 --input_text "Hello there." \
      --ref_name ref1.wav ref2.wav

  # general (speaker id):
  python synthesize.py --config dex_tts_tpu/config/presets/gedex_ljspeech.yaml \
      --weight_path checkpoints/LJSpeech-0 --input_text "Hello." --spk_id 0
"""

from __future__ import annotations

import argparse
import os

import jax

from dex_tts_tpu.audio.wav import write_wav
from dex_tts_tpu.eval.evaluation import load_synthesizer
from dex_tts_tpu.utils import Config, seed_init


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--weight_path", required=True, help="experiment dir with ckpt/")
    p.add_argument("--input_text", required=True)
    p.add_argument("--ref_name", nargs="*", default=None, help="reference wavs (DEX)")
    p.add_argument("--spk_id", type=int, default=None, help="speaker id (GeDEX)")
    p.add_argument("--n_timesteps", type=int, default=50)
    p.add_argument("--dit_cache_interval", type=int, default=1,
                   help="approximate turbo sampling: reuse the DiT "
                        "mid-block for k-1 of every k steps (1 = exact)")
    p.add_argument("--solver", default="euler",
                   choices=["euler", "heun", "dpmpp2m"],
                   help="ODE solver; dpmpp2m (DPM-Solver++ 2M, 2nd-order "
                        "multistep) reaches the 50-step euler solution "
                        "with ~16-25 steps")
    p.add_argument("--temperature", type=float, default=1.5)
    p.add_argument("--length_scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--out_dir", default="./synth_out")
    p.add_argument("--checkpoint_tag", default="best-train")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX backend (some TPU plugins ignore the "
                        "JAX_PLATFORMS env var; this flag does not)")
    p.add_argument("--long", action="store_true",
                   help="treat --input_text as a paragraph: sentence-split, "
                        "synthesize as one batch, concatenate with pauses")
    p.add_argument("--pause_ms", type=float, default=200.0,
                   help="inter-sentence silence for --long")
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg = Config(args.config)
    seed_init(args.seed)
    synth, _ = load_synthesizer(
        cfg, args.weight_path, n_timesteps=args.n_timesteps,
        dit_cache_interval=args.dit_cache_interval, solver=args.solver,
        tag=args.checkpoint_tag,
    )
    os.makedirs(args.out_dir, exist_ok=True)

    refs = args.ref_name or [None]
    key = jax.random.PRNGKey(args.seed)
    for ref in refs:
        key, sub = jax.random.split(key)
        common = dict(
            key=sub,
            temperature=args.temperature,
            length_scale=args.length_scale,
            spk_ids=[args.spk_id] if args.spk_id is not None else None,
            ref_wavs=[ref] if ref else None,
        )
        if args.long:
            # paragraph mode: sentence-split -> one batched call ->
            # concatenated wav with pauses (pipeline.Synthesizer.tts_long)
            long_out = synth.tts_long(
                args.input_text, pause_ms=args.pause_ms, **common
            )
            out = {
                "wav": long_out["wav"],
                "n_frames": sum(s["n_frames"] for s in long_out["sentences"]),
            }
        else:
            out = synth.tts([args.input_text], **common)[0]
        stem = os.path.splitext(os.path.basename(ref))[0] if ref else "sample"
        path = os.path.join(args.out_dir, f"{stem}.wav")
        write_wav(path, out["wav"])
        print(f"wrote {path} ({out['n_frames']} frames)")


if __name__ == "__main__":
    main()
