"""Config presets and model factory.

YAML layout mirrors the reference's sections (path / preprocess / model /
train / test — reference: DEX-TTS/config/VCTK/base.yaml) so users can port
their configs; `build_model` maps a loaded Config to the flax facades.
"""

from __future__ import annotations

import os

from dex_tts_tpu.models.dit import DiTConfig
from dex_tts_tpu.models.tts import DeXTTS, GeDEXTTS
from dex_tts_tpu.text.symbols import N_VOCAB
from dex_tts_tpu.utils import Config

PRESET_DIR = os.path.join(os.path.dirname(__file__), "presets")


def preset_path(name: str) -> str:
    return os.path.join(PRESET_DIR, f"{name}.yaml")


def load_preset(name: str) -> Config:
    return Config(preset_path(name))


def build_dit_config(cfg: Config) -> DiTConfig:
    d = cfg.model.dit
    return DiTConfig(
        patch_size=d.patch_size,
        stride_size=d.stride_size,
        overlap=d.get("overlap", True),
        hidden_size=d.hidden_size,
        depth=d.depth,
        num_heads=d.num_heads,
        mlp_ratio=float(d.mlp_ratio),
        conv_pos=d.get("conv_pos", 16),
        conv_pos_groups=d.get("conv_pos_groups", 8),
        pos_conv_impl=d.get("pos_conv_impl", DiTConfig.pos_conv_impl),
        pos_embed_time=d.get("pos_embed_time", DiTConfig.pos_embed_time),
        mask_type=d.get("mask_type", "random"),
        use_decoder=d.get("use_decoder", False),
        attention=d.get("attention", "einsum"),
        auto_flash_min_tokens=d.get(
            "auto_flash_min_tokens", DiTConfig.auto_flash_min_tokens
        ),
        auto_flash_min_tokens_train=d.get(
            "auto_flash_min_tokens_train", DiTConfig.auto_flash_min_tokens_train
        ),
        # scoped-vmem escape hatch (dit.py MHSA picks padding-aware
        # defaults when these are unset)
        flash_block_q=d.get("flash_block_q", None),
        flash_block_k=d.get("flash_block_k", None),
    )


def build_model(cfg: Config):
    """Config → DeXTTS (style=True) or GeDEXTTS."""
    m = cfg.model
    enc = m.encoder
    dec = m.decoder
    common = dict(
        n_vocab=cfg.get("n_vocab", N_VOCAB),
        n_feats=m.n_feats,
        spk_emb_dim=m.get("spk_emb_dim", 64),
        enc_channels=enc.n_channels,
        enc_filter_channels=enc.filter_channels,
        enc_filter_channels_dp=enc.filter_channels_dp,
        enc_heads=enc.n_heads,
        enc_layers=enc.n_layers,
        enc_kernel=enc.kernel_size,
        enc_dropout=enc.p_dropout,
        use_softmax=enc.get("use_softmax", True),
        use_decay=enc.get("use_decay", False),
        dec_dim=dec.dim,
        dec_dim_mults=tuple(dec.dim_mults),
        pe_scale=float(dec.get("pe_scale", 1000)),
        loss_type=dec.get("loss_type", "base"),
        # denoiser hot-path dtype; "bfloat16" is the fast serving/training
        # mode on TPU (island-free: norms keep f32 stats on tiny tensors)
        compute_dtype=dec.get("compute_dtype", "float32"),
        linattn_impl=dec.get("linattn_impl", "fused"),
        dit=build_dit_config(cfg),
    )
    if cfg.get("model_family", "dex") == "dex":
        # DEX forces n_spks=0 (reference: DEX-TTS/model/tts.py:18)
        tv, lf0, tiv = m.tv_encoder, m.lf0_encoder, m.tiv_encoder
        return DeXTTS(
            n_spks=0,
            tv_c_h=tv.c_h,
            tv_c_out=tv.c_out,
            tv_c_out_g=tv.c_out_g,
            tv_layers=tv.num_layer,
            tv_n_emb=tv.n_emb,
            tv_commit_w=tv.commit_w,
            lf0_c_h=lf0.c_h,
            lf0_c_out=lf0.c_out,
            lf0_c_out_g=lf0.c_out_g,
            lf0_layers=lf0.num_layer,
            tiv_c_h=tiv.c_h,
            tiv_c_out=tiv.c_out,
            tiv_layers=tiv.num_layer,
            **common,
        )
    return GeDEXTTS(n_spks=m.get("n_spks", 1), **common)
