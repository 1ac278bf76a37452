"""PyTorch checkpoint → flax params converters.

Lets users of the reference bring their released weights:
  * HiFi-GAN generator .pth (generator_LJSpeech / generator_universal,
    reference: DEX-TTS/src/utils.py:253-264) → HiFiGANGenerator params.
  * (TTS model converter lands with the numerical-parity harness.)

Verified weight layout mappings (exact to float32 rounding):
  Conv1d   torch (out, in, k)      → flax Conv kernel (k, in, out)
  Conv2d   torch (out, in, kh, kw) → flax Conv kernel (kh, kw, in, out)
  ConvT1d  torch (in, out, k), pad p → flax ConvTranspose(transpose_kernel=
           True) kernel (k, out, in), explicit padding (k-1-p)
  ConvT2d  torch (in, out, kh, kw)   → kernel (kh, kw, out, in)
  Linear   torch (out, in)         → flax Dense kernel (in, out)
"""

from __future__ import annotations

import numpy as np


def fold_weight_norm(state: dict) -> dict:
    """Fold weight_norm (weight_g, weight_v) pairs into plain weights —
    what the reference's remove_weight_norm() does at load
    (reference: DEX-TTS/hifigan/models.py:166-173)."""
    out = {}
    for key, value in state.items():
        if key.endswith("weight_g"):
            continue
        if key.endswith("weight_v"):
            base = key[: -len("_v")]
            g = np.asarray(state[base + "_g"], np.float64)
            v = np.asarray(value, np.float64)
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt(np.sum(v**2, axis=axes, keepdims=True))
            out[base] = (g * v / norm).astype(np.float32)
        else:
            out[key] = np.asarray(value)
    return out


def _conv1d(state, name):
    return {
        "kernel": np.transpose(state[f"{name}.weight"], (2, 1, 0)),
        "bias": state[f"{name}.bias"],
    }


def _convT1d(state, name):
    return {
        "kernel": np.transpose(state[f"{name}.weight"], (2, 1, 0)),
        "bias": state[f"{name}.bias"],
    }


def hifigan_torch_to_flax(state: dict, cfg=None) -> dict:
    """Reference HiFi-GAN generator state_dict → flax params for
    HiFiGANGenerator. Accepts raw (weight-normed) or folded dicts."""
    from dex_tts_tpu.models.vocoder.hifigan import HiFiGANConfig

    cfg = cfg or HiFiGANConfig()
    state = fold_weight_norm(state)
    params = {"conv_pre": _conv1d(state, "conv_pre"),
              "conv_post": _conv1d(state, "conv_post")}
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        params[f"up_{i}"] = _convT1d(state, f"ups.{i}")
        for j in range(n_kernels):
            idx = i * n_kernels + j
            block = {}
            for m in range(len(cfg.resblock_dilation_sizes[j])):
                block[f"conv1_{m}"] = _conv1d(state, f"resblocks.{idx}.convs1.{m}")
                block[f"conv2_{m}"] = _conv1d(state, f"resblocks.{idx}.convs2.{m}")
            params[f"resblock_{i}_{j}"] = block
    return params


def bigvgan_torch_to_flax(state: dict, cfg=None) -> dict:
    """Reference BigVGAN generator state_dict → flax params for
    BigVGANGenerator (reference naming: ups.{i}.0, resblocks.{m}.convs1/2,
    resblocks.{m}.activations.{j}.act.{alpha,beta})."""
    from dex_tts_tpu.models.vocoder.bigvgan import BigVGANConfig

    cfg = cfg or BigVGANConfig()
    state = fold_weight_norm(state)
    params = {"conv_pre": _conv1d(state, "conv_pre"),
              "conv_post": _conv1d(state, "conv_post")}

    def snake(prefix):
        out = {"alpha": state[f"{prefix}.alpha"]}
        if f"{prefix}.beta" in state:
            out["beta"] = state[f"{prefix}.beta"]
        return out

    params["act_post"] = snake("activation_post.act")
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        params[f"up_{i}"] = _convT1d(state, f"ups.{i}.0")
        for j in range(n_kernels):
            m = i * n_kernels + j
            block = {}
            n_dil = len(cfg.resblock_dilation_sizes[j])
            if cfg.resblock == "1":
                for d in range(n_dil):
                    block[f"conv1_{d}"] = _conv1d(state, f"resblocks.{m}.convs1.{d}")
                    block[f"conv2_{d}"] = _conv1d(state, f"resblocks.{m}.convs2.{d}")
                    block[f"act1_{d}"] = snake(
                        f"resblocks.{m}.activations.{2 * d}.act"
                    )
                    block[f"act2_{d}"] = snake(
                        f"resblocks.{m}.activations.{2 * d + 1}.act"
                    )
            else:
                for d in range(min(n_dil, 2)):
                    block[f"conv_{d}"] = _conv1d(state, f"resblocks.{m}.convs.{d}")
                    block[f"act_{d}"] = snake(
                        f"resblocks.{m}.activations.{d}.act"
                    )
            params[f"resblock_{i}_{j}"] = block
    return params


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth file into a {name: np.ndarray} dict (host-side torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "generator" in ckpt:
        ckpt = ckpt["generator"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.numpy() for k, v in ckpt.items()}
