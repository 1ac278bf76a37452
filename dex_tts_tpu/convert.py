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


# ---------------------------------------------------------------------------
# DEX / GeDEX TTS model converter


def _dense(state, name):
    out = {"kernel": np.transpose(state[f"{name}.weight"])}
    if f"{name}.bias" in state:
        out["bias"] = state[f"{name}.bias"]
    return out


def _conv1x1_to_dense(state, name):
    """torch Conv1d k=1 (out, in, 1) → Dense kernel (in, out)."""
    out = {"kernel": np.transpose(state[f"{name}.weight"][:, :, 0])}
    if f"{name}.bias" in state:
        out["bias"] = state[f"{name}.bias"]
    return out


def _conv2d(state, name):
    out = {"kernel": np.transpose(state[f"{name}.weight"], (2, 3, 1, 0))}
    if f"{name}.bias" in state:
        out["bias"] = state[f"{name}.bias"]
    return out


def _convT2d(state, name):
    return {
        "kernel": np.transpose(state[f"{name}.weight"], (2, 3, 1, 0)),
        "bias": state[f"{name}.bias"],
    }


def _basic_conv(state, name, norm=None):
    """reference BasicConv (model/base.py:34-65) → {Conv1d_0, BatchNorm_0 |
    LayerNorm_0}. Returns (params, batch_stats)."""
    params = {"Conv1d_0": {"Conv_0": {"kernel": np.transpose(
        state[f"{name}.conv.weight"], (2, 1, 0))}}}
    stats = {}
    if norm == "bn":
        params["BatchNorm_0"] = {
            "scale": state[f"{name}.bn.weight"],
            "bias": state[f"{name}.bn.bias"],
        }
        stats["BatchNorm_0"] = {
            "mean": state[f"{name}.bn.running_mean"],
            "var": state[f"{name}.bn.running_var"],
        }
    elif norm == "ln":
        params["LayerNorm_0"] = {
            "scale": state[f"{name}.ln.weight"],
            "bias": state[f"{name}.ln.bias"],
        }
    return params, stats


def _channel_ln(state, name):
    return {"gamma": state[f"{name}.gamma"], "beta": state[f"{name}.beta"]}


def _projection(state, name):
    """reference Projection (ref_encoder.py:8-34) / DurationPredictor-style
    head → {conv_1, norm_1, conv_2, norm_2, proj}."""
    return {
        "conv_1": {"Conv_0": _conv1d(state, f"{name}.conv_1")},
        "norm_1": _channel_ln(state, f"{name}.norm_1"),
        "conv_2": {"Conv_0": _conv1d(state, f"{name}.conv_2")},
        "norm_2": _channel_ln(state, f"{name}.norm_2"),
        "proj": _conv1x1_to_dense(state, f"{name}.proj"),
    }


def _gru(state, name, num_layers):
    """torch nn.GRU(bidirectional) → BiGRU {fwd_i, bwd_i} GRUCell params.
    torch gate order (r, z, n); flax hr/hz carry no bias so torch's b_h{r,z}
    fold into the input-side biases (identical math)."""
    out = {}
    for layer in range(num_layers):
        for direction, tag in (("", "fwd"), ("_reverse", "bwd")):
            w_ih = state[f"{name}.weight_ih_l{layer}{direction}"]
            w_hh = state[f"{name}.weight_hh_l{layer}{direction}"]
            b_ih = state[f"{name}.bias_ih_l{layer}{direction}"]
            b_hh = state[f"{name}.bias_hh_l{layer}{direction}"]
            h = w_hh.shape[1]
            wir, wiz, win = w_ih[:h], w_ih[h : 2 * h], w_ih[2 * h :]
            whr, whz, whn = w_hh[:h], w_hh[h : 2 * h], w_hh[2 * h :]
            bir, biz, bin_ = b_ih[:h], b_ih[h : 2 * h], b_ih[2 * h :]
            bhr, bhz, bhn = b_hh[:h], b_hh[h : 2 * h], b_hh[2 * h :]
            out[f"{tag}_{layer}"] = {
                "ir": {"kernel": wir.T, "bias": bir + bhr},
                "iz": {"kernel": wiz.T, "bias": biz + bhz},
                "in": {"kernel": win.T, "bias": bin_},
                "hr": {"kernel": whr.T},
                "hz": {"kernel": whz.T},
                "hn": {"kernel": whn.T, "bias": bhn},
            }
    return out


def _res_conv_block(state, name, norm):
    """reference TV/TIVEncoderBlock (ref_encoder.py:57-81)."""
    p1, s1 = _basic_conv(state, f"{name}.conv_block.0", norm)
    p2, s2 = _basic_conv(state, f"{name}.conv_block.1", None)
    params = {"conv1": p1, "conv2": p2}
    stats = {}
    if s1:
        stats["conv1"] = s1
    return params, stats


def _unet_resnet(state, name):
    p = {
        "mlp": _dense(state, f"{name}.mlp.1"),
        "block1": {
            "Conv_0": _conv2d(state, f"{name}.block1.block.0"),
            "GroupNorm_0": {
                "scale": state[f"{name}.block1.block.1.weight"],
                "bias": state[f"{name}.block1.block.1.bias"],
            },
        },
        "block2": {
            "Conv_0": _conv2d(state, f"{name}.block2.block.0"),
            "GroupNorm_0": {
                "scale": state[f"{name}.block2.block.1.weight"],
                "bias": state[f"{name}.block2.block.1.bias"],
            },
        },
    }
    if f"{name}.res_conv.weight" in state:
        p["res_conv"] = _conv2d(state, f"{name}.res_conv")
    return p


def _unet_attn(state, name):
    # the reference's fused to_qkv conv weight (3·hidden, C, 1, 1) splits
    # into our three dense kernels (C, hidden) — out-channel order is
    # [q; k; v] (reference rearrange 'b (qkv heads c) h w', diffusion.py:88)
    w = state[f"{name}.fn.fn.to_qkv.weight"][:, :, 0, 0]  # (3h, C)
    hidden = w.shape[0] // 3
    return {
        "fn": {
            "to_q": {"kernel": np.ascontiguousarray(w[:hidden].T)},
            "to_k": {"kernel": np.ascontiguousarray(w[hidden : 2 * hidden].T)},
            "to_v": {"kernel": np.ascontiguousarray(w[2 * hidden :].T)},
            "to_out": _conv2d(state, f"{name}.fn.fn.to_out"),
        },
        "g": state[f"{name}.fn.g"],
    }


def _dit(state, prefix, depth, use_decoder=False):
    """reference DiTMask (dit.py:328-457) → decoder/dit tree."""
    p = {
        "x_embedder": {
            "dw_conv": _conv2d(state, f"{prefix}.x_embedder.proj.0"),
            "pw_conv": _conv2d(state, f"{prefix}.x_embedder.proj.2"),
        },
        "t_embedder": {
            "fc1": _dense(state, f"{prefix}.t_embedder.mlp.0"),
            "fc2": _dense(state, f"{prefix}.t_embedder.mlp.2"),
        },
        "time_pos": {"pos_conv": _conv2d(state, f"{prefix}.pos_conv.0")},
        "freq_pos_embed": np.transpose(
            state[f"{prefix}.freq_new_pos_embed"], (0, 2, 3, 1)
        ),
        "final_layer": {
            "adaLN_modulation": _dense(
                state, f"{prefix}.final_layer.adaLN_modulation.1"
            ),
            "linear": _dense(state, f"{prefix}.final_layer.linear"),
        },
    }
    for i in range(depth):
        p[f"block_{i}"] = {
            "attn": {
                "qkv": _dense(state, f"{prefix}.blocks.{i}.attn.qkv"),
                "proj": _dense(state, f"{prefix}.blocks.{i}.attn.proj"),
            },
            "mlp_fc1": _dense(state, f"{prefix}.blocks.{i}.mlp.fc1"),
            "mlp_fc2": _dense(state, f"{prefix}.blocks.{i}.mlp.fc2"),
            "adaLN_modulation": _dense(
                state, f"{prefix}.blocks.{i}.adaLN_modulation.1"
            ),
        }
    if use_decoder:
        p["decoder_pos_conv"] = {
            "pos_conv": _conv1d(state, f"{prefix}.decoder_pos_conv.0")
        }
        for i in range(depth):
            p[f"decoder_block_{i}"] = {
                "attn": {
                    "qkv": _dense(state, f"{prefix}.decoder_blocks.{i}.attn.qkv"),
                    "proj": _dense(
                        state, f"{prefix}.decoder_blocks.{i}.attn.proj"
                    ),
                },
                "mlp_fc1": _dense(state, f"{prefix}.decoder_blocks.{i}.mlp.fc1"),
                "mlp_fc2": _dense(state, f"{prefix}.decoder_blocks.{i}.mlp.fc2"),
                "adaLN_modulation": _dense(
                    state, f"{prefix}.decoder_blocks.{i}.adaLN_modulation.1"
                ),
            }
    return p


def dex_tts_torch_to_flax(state: dict, model) -> dict:
    """Reference DeXTTS/GeDEXTTS state_dict → flax variables
    {params, batch_stats, vq_stats} for the corresponding facade.

    Name map sources: DEX-TTS/model/{tts,text_encoder,retnet,retention,
    ref_encoder,diffusion,dit}.py. The conv/dense/GRU weight layouts are the
    empirically verified mappings documented at the top of this module.
    """
    state = fold_weight_norm(state)
    use_style = getattr(model, "use_style", False)
    params: dict = {}
    batch_stats: dict = {}
    vq_stats: dict = {}

    # ---- text encoder ----
    enc = {"emb": {"embedding": state["encoder.emb.weight"]}}
    prenet = {"proj": _conv1x1_to_dense(state, "encoder.prenet.proj")}
    for i in range(3):
        prenet[f"conv_{i}"] = {
            "Conv_0": _conv1d(state, f"encoder.prenet.conv_layers.{i}")
        }
        prenet[f"norm_{i}"] = _channel_ln(state, f"encoder.prenet.norm_layers.{i}")
    enc["prenet"] = prenet

    retnet = {"norm": {"weight": state["encoder.encoder.layer_norm.weight"]}}
    n_layers = model.enc_layers
    for i in range(n_layers):
        base = f"encoder.encoder.layers.{i}"
        layer = {
            "retention_norm": {"weight": state[f"{base}.retention_layer_norm.weight"]},
            "final_norm": {"weight": state[f"{base}.final_layer_norm.weight"]},
            "retention": {
                f"{p}_proj": _dense(state, f"{base}.retention.{p}_proj")
                for p in ("q", "k", "v", "g", "out")
            },
            "ffn": {
                "gate": _dense(state, f"{base}.ffn.gate"),
                "fc1": _dense(state, f"{base}.ffn.fc1"),
                "fc2": _dense(state, f"{base}.ffn.fc2"),
            },
        }
        if use_style:
            for a in ("adaln_1", "adaln_2"):
                layer[a] = {
                    "W_scale": _dense(state, f"{base}.{a}.W_scale"),
                    "W_bias": _dense(state, f"{base}.{a}.W_bias"),
                }
        retnet[f"layer_{i}"] = layer
    enc["encoder"] = retnet
    enc["proj_m"] = _conv1x1_to_dense(state, "encoder.proj_m")
    enc["proj_w"] = _projection_dp(state, "encoder.proj_w")
    params["encoder"] = enc

    if getattr(model, "n_spks", 1) > 1 and "spk_emb.weight" in state:
        params["spk_emb"] = {"embedding": state["spk_emb.weight"]}

    # ---- style encoders (DEX) ----
    if use_style:
        params["conv_sty"] = _conv1x1_to_dense(state, "conv_sty")

        tv, tv_stats = {}, {}
        tv["in_conv"], _ = _basic_conv(state, "tv_encoder.in_conv", "ln")
        for i in range(model.tv_layers):
            tv[f"block_{i}"], _ = _res_conv_block(
                state, f"tv_encoder.conv_blocks.{i}", "ln"
            )
        tv["out_conv"], _ = _basic_conv(state, "tv_encoder.out_conv", None)
        tv["proj_0"] = _projection(state, "tv_encoder.proj_0")
        tv["proj_1"], s = _basic_conv(state, "tv_encoder.proj_1", "bn")
        tv_stats["proj_1"] = s
        params["tv_encoder"] = tv
        batch_stats["tv_encoder"] = tv_stats
        vq_stats["tv_encoder"] = {
            "vq": {
                "embedding": state["tv_encoder.vq.embedding"],
                "ema_count": state["tv_encoder.vq.ema_count"],
                "ema_weight": state["tv_encoder.vq.ema_weight"],
            }
        }

        tiv, tiv_stats = {}, {}
        tiv["in_conv"], s = _basic_conv(state, "tiv_encoder.in_conv", "bn")
        tiv_stats["in_conv"] = s
        for i in range(model.tiv_layers):
            tiv[f"block_{i}"], s = _res_conv_block(
                state, f"tiv_encoder.conv_blocks.{i}", "bn"
            )
            tiv_stats[f"block_{i}"] = s
        tiv["out_conv"], s = _basic_conv(state, "tiv_encoder.out_conv", "bn")
        tiv_stats["out_conv"] = s
        params["tiv_encoder"] = tiv
        batch_stats["tiv_encoder"] = tiv_stats

        lf0 = {}
        lf0["in_conv"], _ = _basic_conv(state, "lf0_encoder.in_conv", "ln")
        lf0["out_conv"], _ = _basic_conv(state, "lf0_encoder.out_conv", "ln")
        lf0["rnn"] = _gru(state, "lf0_encoder.rnn_layer", model.lf0_layers)
        lf0["proj"] = _projection(state, "lf0_encoder.proj")
        params["lf0_encoder"] = lf0

    # ---- denoiser ----
    dit_depth = (model.dit.depth if model.dit is not None else 4)
    params["decoder"] = denoiser_torch_to_flax(
        state,
        prefix="decoder.denoise_fn",
        n_res=len(model.dec_dim_mults),
        dit_depth=dit_depth,
        use_style=use_style,
        n_spks=getattr(model, "n_spks", 1),
        dit_use_decoder=(
            model.dit.use_decoder if model.dit is not None else False
        ),
    )

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    if vq_stats:
        variables["vq_stats"] = vq_stats
    return variables


def denoiser_torch_to_flax(
    state: dict,
    prefix: str = "decoder.denoise_fn",
    n_res: int = 2,
    dit_depth: int = 4,
    use_style: bool = True,
    n_spks: int = 1,
    dit_use_decoder: bool = False,
) -> dict:
    """Reference DiffusionDenoiser subtree → flax `decoder` params."""
    d = prefix
    dec = {
        "time_fc1": _dense(state, f"{d}.mlp.0"),
        "time_fc2": _dense(state, f"{d}.mlp.2"),
        "final_block": {
            "Conv_0": _conv2d(state, f"{d}.final_block.block.0"),
            "GroupNorm_0": {
                "scale": state[f"{d}.final_block.block.1.weight"],
                "bias": state[f"{d}.final_block.block.1.bias"],
            },
        },
        "final_conv": _conv2d(state, f"{d}.final_conv"),
    }
    if use_style:
        dec["adap_fc1"] = _dense(state, f"{d}.mlp_adap.0")
        dec["adap_fc2"] = _dense(state, f"{d}.mlp_adap.2")
        dec["adap_sty_fc1"] = _dense(state, f"{d}.mlp_adap_sty.0")
        dec["adap_sty_fc2"] = _dense(state, f"{d}.mlp_adap_sty.2")
        dec["tv_adaptor"] = {
            name: _dense(state, f"{d}.tv_adaptor.{name}")
            for name in ("w_q", "w_k", "w_v", "linear")
        }
        dec["tiv_adaptor"] = {
            "mean_sap": {"W": _dense(state, f"{d}.tiv_adaptor.mean_sap.W")},
            "std_sap": {"W": _dense(state, f"{d}.tiv_adaptor.std_sap.W")},
        }
    elif n_spks > 1:
        dec["spk_fc1"] = _dense(state, f"{d}.spk_mlp.0")
        dec["spk_fc2"] = _dense(state, f"{d}.spk_mlp.2")

    for i in range(n_res):
        dec[f"down_{i}_res1"] = _unet_resnet(state, f"{d}.downs.{i}.0")
        dec[f"down_{i}_res2"] = _unet_resnet(state, f"{d}.downs.{i}.1")
        dec[f"down_{i}_attn"] = _unet_attn(state, f"{d}.downs.{i}.2")
        if i < n_res - 1:
            dec[f"down_{i}_downsample"] = {
                "Conv_0": _conv2d(state, f"{d}.downs.{i}.3.conv")
            }
    for j in range(n_res - 1):
        dec[f"up_{j}_res1"] = _unet_resnet(state, f"{d}.ups.{j}.0")
        dec[f"up_{j}_res2"] = _unet_resnet(state, f"{d}.ups.{j}.1")
        dec[f"up_{j}_attn"] = _unet_attn(state, f"{d}.ups.{j}.2")
        dec[f"up_{j}_upsample"] = {
            "ConvTranspose_0": _convT2d(state, f"{d}.ups.{j}.3.conv")
        }
    dec["dit"] = _dit(state, f"{d}.vit", dit_depth, use_decoder=dit_use_decoder)
    return dec


def _projection_dp(state, name):
    """reference DurationPredictor (text_encoder.py:66-92) — same layout as
    Projection."""
    return _projection(state, name)


def load_torch_checkpoint(path: str, key: str | None = None) -> dict:
    """Load a .pth/.pth.tar/.pth.tar.zip file into a {name: np.ndarray} dict.

    Handles the distribution formats the reference points users at
    (reference: DEX-TTS/src/utils.py:251-281): a torch-serialized file
    (zip-format or legacy pickle) or a *plain* zip archive wrapping one
    (e.g. ``generator_universal.pth.tar.zip`` from the HiFi-GAN release).

    key: select a specific sub-dict of a trainer checkpoint instead of the
    auto-unwrap — e.g. "ema" for the EMA weights of a reference TTS
    checkpoint {'scores','state_dict','ema','optimizer'}
    (reference: DEX-TTS/src/train.py:112-122).
    """
    ckpt = _load_torch_raw(path)
    if key is not None:
        ckpt = ckpt[key]
    else:
        if isinstance(ckpt, dict) and "generator" in ckpt:
            ckpt = ckpt["generator"]
        if isinstance(ckpt, dict) and "state_dict" in ckpt:
            ckpt = ckpt["state_dict"]
    return _tensors_to_numpy(ckpt)


def _tensors_to_numpy(state: dict) -> dict:
    return {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}


def load_torch_trainer_checkpoint(path: str) -> tuple[dict, dict | None]:
    """One disk read of a reference trainer checkpoint → (state_dict, ema).

    ema is None when the file is a bare state_dict (no trainer wrapper) or
    the wrapper has no 'ema' key. reference: DEX-TTS/src/train.py:112-122.
    """
    ckpt = _load_torch_raw(path)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = _tensors_to_numpy(ckpt["state_dict"])
        ema = ckpt.get("ema")
        return sd, (_tensors_to_numpy(ema) if isinstance(ema, dict) else None)
    return _tensors_to_numpy(ckpt), None


def _load_torch_raw(path: str):
    import torch

    def _load_file(p):
        return torch.load(p, map_location="cpu", weights_only=True)

    try:
        ckpt = _load_file(path)
    except Exception as first_exc:
        # maybe an outer plain zip wrapping the checkpoint file: extract the
        # largest member and load that. NB a torch zip-format file that
        # merely failed weights_only deserialization is also a valid
        # zipfile — detect it by its data.pkl record and re-raise the
        # original error rather than extracting a raw storage blob.
        import tempfile
        import zipfile

        if not zipfile.is_zipfile(path):
            raise
        with zipfile.ZipFile(path) as zf:
            members = [n for n in zf.namelist() if not n.endswith("/")]
            if not members or any(n.endswith("data.pkl") for n in members):
                raise
            inner = max(members, key=lambda n: zf.getinfo(n).file_size)
            with tempfile.TemporaryDirectory() as td:
                try:
                    ckpt = _load_file(zf.extract(inner, td))
                except Exception:
                    raise first_exc  # wrapper theory wrong: original error
    return ckpt
