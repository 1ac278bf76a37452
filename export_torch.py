"""Export framework-trained checkpoints to reference PyTorch format.

The reverse migration path: a TTS experiment trained here (orbax) becomes a
``{'state_dict', 'ema'}`` checkpoint that the reference's evaluation and
synthesis loaders read (reference: DEX-TTS/src/evaluation.py:29-34,
synthesize.py:68-72; torch-Adam 'optimizer' resume state is not exported —
see dex_tts_tpu/export.py), and a vocoder generator becomes a
``{'generator': ...}`` dict with weight-norm parametrization restored
(reference: DEX-TTS/src/utils.py:251-281).

  # TTS experiment → model-export.pth
  python export_torch.py --config cfg.yaml --weight_path checkpoints/VCTK-0

  # vocoder generator (cfg.vocoder + cfg.path.vocoder_path select it)
  python export_torch.py --config cfg.yaml --vocoder --out generator.pth
"""

from __future__ import annotations

import argparse
import os

from dex_tts_tpu.config import build_model
from dex_tts_tpu.export import (
    bigvgan_flax_to_torch,
    dex_tts_flax_to_torch,
    hifigan_flax_to_torch,
    save_torch_checkpoint,
)
from dex_tts_tpu.utils import Config


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--weight_path", default=None,
                   help="experiment dir with ckpt/ (TTS export)")
    p.add_argument("--tag", default="best-train")
    p.add_argument("--vocoder", action="store_true",
                   help="export the generator cfg.vocoder/cfg.path."
                        "vocoder_path resolve to instead of the TTS model")
    p.add_argument("--out", default=None,
                   help="output .pth path (default: <weight_path>/export/"
                        "model-export.pth, or ./generator-export.pth)")
    return p.parse_args()


def export_tts(cfg, exp_dir: str, tag: str, out: str) -> None:
    from dex_tts_tpu.eval.evaluation import build_init_batch
    from dex_tts_tpu.train.checkpoint import CheckpointManager
    from dex_tts_tpu.train.state import create_train_state

    model = build_model(cfg)
    state, _ = create_train_state(model, build_init_batch(cfg))
    state = CheckpointManager(os.path.join(exp_dir, "ckpt")).restore(state, tag)

    stats = {"batch_stats": state.batch_stats, "vq_stats": state.vq_stats}
    sd = dex_tts_flax_to_torch({"params": state.params, **stats}, model)
    ema = dex_tts_flax_to_torch({"params": state.ema_params, **stats}, model)
    save_torch_checkpoint(out, {"state_dict": sd, "ema": ema})
    print(f"wrote {out} ({len(sd)} tensors + ema)")


def export_vocoder(cfg, out: str) -> None:
    from dex_tts_tpu.eval.evaluation import load_vocoder
    from dex_tts_tpu.models.vocoder import HiFiGANGenerator

    # strict: exporting load_vocoder's random-init smoke fallback would
    # silently ship an untrained generator
    voc, params = load_vocoder(cfg, strict=True)
    if isinstance(voc, HiFiGANGenerator):
        state = hifigan_flax_to_torch(params, voc.cfg)
    else:
        state = bigvgan_flax_to_torch(params, voc.cfg)
    save_torch_checkpoint(out, {"generator": state})
    print(f"wrote {out} ({len(state)} tensors, weight-norm restored)")


def main():
    args = parse_args()
    # pure host-side weight conversion: force the CPU backend so the export
    # never blocks on the (possibly down) remote-TPU tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")
    cfg = Config(args.config)
    if args.vocoder:
        out = args.out or "./generator-export.pth"
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        export_vocoder(cfg, out)
    else:
        if not args.weight_path:
            raise SystemExit("--weight_path is required for TTS export")
        out = args.out or os.path.join(
            args.weight_path, "export", "model-export.pth"
        )
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        export_tts(cfg, args.weight_path, args.tag, out)


if __name__ == "__main__":
    main()
