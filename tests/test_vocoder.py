import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dex_tts_tpu.convert import fold_weight_norm, hifigan_torch_to_flax
from dex_tts_tpu.models.vocoder import HiFiGANConfig, HiFiGANGenerator

torch = pytest.importorskip("torch")

TINY = HiFiGANConfig(
    num_mels=8,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=16,
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 2), (1, 2)),
)


def build_torch_generator(cfg):
    """Torch twin of HiFiGANGenerator built from primitives (independent
    implementation used as a numerical oracle)."""
    tn = torch.nn

    class TorchRes(tn.Module):
        def __init__(self, ch, k, dils):
            super().__init__()
            self.c1 = tn.ModuleList(
                [tn.Conv1d(ch, ch, k, dilation=d, padding=(k * d - d) // 2)
                 for d in dils]
            )
            self.c2 = tn.ModuleList(
                [tn.Conv1d(ch, ch, k, padding=(k - 1) // 2) for _ in dils]
            )

        def forward(self, x):
            for a, b in zip(self.c1, self.c2):
                h = torch.nn.functional.leaky_relu(x, 0.1)
                h = a(h)
                h = torch.nn.functional.leaky_relu(h, 0.1)
                h = b(h)
                x = x + h
            return x

    class TorchGen(tn.Module):
        def __init__(self):
            super().__init__()
            self.conv_pre = tn.Conv1d(cfg.num_mels, cfg.upsample_initial_channel,
                                      7, padding=3)
            self.ups = tn.ModuleList()
            self.res = tn.ModuleList()
            for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                           cfg.upsample_kernel_sizes)):
                cin = cfg.upsample_initial_channel // (2**i)
                ch = cin // 2
                self.ups.append(tn.ConvTranspose1d(cin, ch, k, u,
                                                   padding=(k - u) // 2))
                for rk, rd in zip(cfg.resblock_kernel_sizes,
                                  cfg.resblock_dilation_sizes):
                    self.res.append(TorchRes(ch, rk, rd))
            self.conv_post = tn.Conv1d(ch, 1, 7, padding=3)

        def forward(self, x):
            x = self.conv_pre(x)
            nk = len(cfg.resblock_kernel_sizes)
            for i, up in enumerate(self.ups):
                x = torch.nn.functional.leaky_relu(x, 0.1)
                x = up(x)
                xs = sum(self.res[i * nk + j](x) for j in range(nk))
                x = xs / nk
            x = torch.nn.functional.leaky_relu(x)
            return torch.tanh(self.conv_post(x))

    return TorchGen()


def torch_state_to_reference_names(gen, cfg):
    """Rename the twin's params to the reference checkpoint naming
    (conv_pre / ups.N / resblocks.M.convsX.K / conv_post)."""
    state = {}
    sd = gen.state_dict()
    state["conv_pre.weight"] = sd["conv_pre.weight"].numpy()
    state["conv_pre.bias"] = sd["conv_pre.bias"].numpy()
    state["conv_post.weight"] = sd["conv_post.weight"].numpy()
    state["conv_post.bias"] = sd["conv_post.bias"].numpy()
    for i in range(len(cfg.upsample_rates)):
        state[f"ups.{i}.weight"] = sd[f"ups.{i}.weight"].numpy()
        state[f"ups.{i}.bias"] = sd[f"ups.{i}.bias"].numpy()
    n_blocks = len(cfg.upsample_rates) * len(cfg.resblock_kernel_sizes)
    for m in range(n_blocks):
        for branch in ("c1", "c2"):
            out_branch = "convs1" if branch == "c1" else "convs2"
            for k in range(len(cfg.resblock_dilation_sizes[0])):
                for p in ("weight", "bias"):
                    state[f"resblocks.{m}.{out_branch}.{k}.{p}"] = sd[
                        f"res.{m}.{branch}.{k}.{p}"
                    ].numpy()
    return state


def test_hifigan_matches_torch_twin():
    torch.manual_seed(0)
    gen = build_torch_generator(TINY).eval()
    mel = torch.randn(2, 8, 25)
    with torch.no_grad():
        want = gen(mel).numpy()[:, 0, :]

    state = torch_state_to_reference_names(gen, TINY)
    params = hifigan_torch_to_flax(state, TINY)
    model = HiFiGANGenerator(TINY)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(mel.numpy())))
    assert got.shape == want.shape == (2, 25 * 8)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fold_weight_norm_matches_torch():
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 6, 3, padding=1))
    x = torch.randn(1, 4, 10)
    with torch.no_grad():
        want = conv(x).numpy()
    state = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
    folded = fold_weight_norm(state)
    plain = torch.nn.Conv1d(4, 6, 3, padding=1)
    with torch.no_grad():
        plain.weight.copy_(torch.from_numpy(folded["weight"]))
        plain.bias.copy_(torch.from_numpy(folded["bias"]))
        got = plain(x).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_hifigan_output_range_and_length():
    model = HiFiGANGenerator(TINY)
    mel = jnp.zeros((1, 8, 30))
    params = model.init(jax.random.PRNGKey(0), mel)
    wav = model.apply(params, mel)
    assert wav.shape == (1, 30 * 8)
    assert float(jnp.abs(wav).max()) <= 1.0


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/DEX-TTS/hifigan"),
    reason="reference repo not mounted",
)
def test_hifigan_matches_reference_implementation():
    """Full-architecture parity against the actual reference generator
    (random weights, weight norm folded)."""
    sys.path.insert(0, "/root/reference/DEX-TTS")
    from hifigan.models import Generator as RefGenerator

    class H(dict):
        __getattr__ = dict.__getitem__

    h = H(
        resblock="1",
        upsample_rates=[8, 8, 2, 2],
        upsample_kernel_sizes=[16, 16, 4, 4],
        upsample_initial_channel=32,
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    )
    torch.manual_seed(1)
    ref = RefGenerator(h)
    ref.remove_weight_norm()
    ref.eval()
    mel = torch.randn(1, 80, 17)
    with torch.no_grad():
        want = ref(mel).numpy()[:, 0, :]

    cfg = HiFiGANConfig(
        upsample_initial_channel=32,
    )
    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = hifigan_torch_to_flax(state, cfg)
    model = HiFiGANGenerator(cfg)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(mel.numpy())))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_load_vocoder_zip_checkpoint(tmp_path):
    """load_vocoder resolves a `generator_universal.pth.tar.zip` container
    (plain zip wrapping the torch file, the HiFi-GAN release layout) via the
    candidates list, honoring the adjacent config.json architecture
    (reference: DEX-TTS/src/utils.py:251-281)."""
    import json
    import zipfile

    from dex_tts_tpu.eval.evaluation import load_vocoder
    from dex_tts_tpu.utils import Config

    torch.manual_seed(0)
    gen = build_torch_generator(TINY).eval()
    state = torch_state_to_reference_names(gen, TINY)
    inner = tmp_path / "generator_universal.pth.tar"
    torch.save(
        {"generator": {k: torch.from_numpy(v) for k, v in state.items()}},
        str(inner),
    )
    outer = tmp_path / "generator_universal.pth.tar.zip"
    with zipfile.ZipFile(outer, "w") as zf:
        zf.write(str(inner), "generator_universal.pth.tar")
    inner.unlink()  # only the zip candidate exists
    with open(tmp_path / "config.json", "w") as f:
        json.dump(
            {
                "num_mels": TINY.num_mels,
                "upsample_rates": list(TINY.upsample_rates),
                "upsample_kernel_sizes": list(TINY.upsample_kernel_sizes),
                "upsample_initial_channel": TINY.upsample_initial_channel,
                "resblock_kernel_sizes": list(TINY.resblock_kernel_sizes),
                "resblock_dilation_sizes": [
                    list(d) for d in TINY.resblock_dilation_sizes
                ],
            },
            f,
        )

    cfg = Config(
        {
            "vocoder": "hifigan",
            "preprocess": {"n_mels": TINY.num_mels},
            "path": {"vocoder_path": str(tmp_path)},
        }
    )
    voc, params = load_vocoder(cfg)
    assert voc.cfg.upsample_initial_channel == TINY.upsample_initial_channel

    mel = torch.randn(1, TINY.num_mels, 19)
    with torch.no_grad():
        want = gen(mel).numpy()[:, 0, :]
    got = np.asarray(
        voc.apply({"params": params}, jnp.asarray(mel.numpy()))
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_load_vocoder_strict_raises_without_checkpoint(tmp_path):
    """strict=True refuses the random-init smoke fallback (the export CLI
    uses this so it can never ship untrained generator weights)."""
    import pytest

    from dex_tts_tpu.eval.evaluation import load_vocoder
    from dex_tts_tpu.utils import Config

    cfg = Config(
        {
            "vocoder": "hifigan",
            "preprocess": {"n_mels": TINY.num_mels},
            "path": {"vocoder_path": str(tmp_path)},  # empty dir
        }
    )
    with pytest.raises(FileNotFoundError):
        load_vocoder(cfg, strict=True)
    # non-strict still smoke-falls-back
    voc, params = load_vocoder(cfg)
    assert params


def test_load_vocoder_snake_impl_knob():
    """`vocoder_snake_impl` in the eval yaml reaches BigVGANConfig (the
    TPU fold/polyphase lowering selector, ops/snake.py)."""
    from dex_tts_tpu.eval.evaluation import load_vocoder
    from dex_tts_tpu.utils import Config

    cfg = Config(
        {
            "vocoder": "bigvgan",
            "preprocess": {"n_mels": 80},
            "path": {},
            "vocoder_snake_impl": "fold",
        }
    )
    voc, params = load_vocoder(cfg)
    assert voc.cfg.snake_impl == "fold"
    assert params


def test_load_vocoder_upsample_impl_and_auto_dtype_knobs():
    """`vocoder_upsample_impl` reaches both generators' configs and
    `vocoder_dtype: auto` resolves to a real dtype (bf16 BigVGAN on TPU,
    f32 otherwise) instead of crashing jnp.dtype."""
    from dex_tts_tpu.eval.evaluation import load_vocoder
    from dex_tts_tpu.utils import Config

    for kind in ("hifigan", "bigvgan"):
        cfg = Config(
            {
                "vocoder": kind,
                "preprocess": {"n_mels": 80},
                "path": {},
                "vocoder_upsample_impl": "subpixel",
                "vocoder_dtype": "auto",
            }
        )
        voc, params = load_vocoder(cfg)
        assert voc.cfg.upsample_impl == "subpixel"
        assert voc.cfg.dtype in ("float32", "bfloat16")
        assert params


def test_subpixel_upsampler_matches_conv_transpose():
    """The subpixel (polyphase depth-to-space) upsampler lowering is
    numerically the same op with the same param tree as the default
    nn.ConvTranspose form — at every (k, u) pair the vocoders use
    (HiFi-GAN/BigVGAN-22k: (16,8), (8,4), (4,2))."""
    import dataclasses

    from flax.core import unfreeze

    from dex_tts_tpu.models.vocoder import BigVGANConfig, BigVGANGenerator

    rng = jax.random.PRNGKey(3)
    mel = jax.random.normal(rng, (2, 8, 30))

    for base_cfg, gen_cls in (
        (TINY, HiFiGANGenerator),
        (
            BigVGANConfig(
                num_mels=8,
                upsample_rates=(4, 2),
                upsample_kernel_sizes=(8, 4),
                upsample_initial_channel=16,
                resblock_kernel_sizes=(3, 5),
                resblock_dilation_sizes=((1, 2), (1, 2)),
            ),
            BigVGANGenerator,
        ),
    ):
        ref_model = gen_cls(base_cfg)
        sub_model = gen_cls(
            dataclasses.replace(base_cfg, upsample_impl="subpixel")
        )
        params = ref_model.init(rng, mel)
        # identical param trees → checkpoint-interchangeable
        sub_params = sub_model.init(rng, mel)
        assert jax.tree.structure(unfreeze(params)) == jax.tree.structure(
            unfreeze(sub_params)
        )
        y_ref = ref_model.apply(params, mel)
        y_sub = sub_model.apply(params, mel)
        assert y_ref.shape == y_sub.shape
        np.testing.assert_allclose(
            np.asarray(y_ref), np.asarray(y_sub), rtol=0, atol=2e-5
        )

    # also the odd (16, 8) pair at full HiFi-GAN scale on one layer
    from dex_tts_tpu.models.vocoder.upsample import SubpixelConvTranspose
    import flax.linen as nn

    x = jax.random.normal(rng, (1, 13, 6))
    for k, u in ((16, 8), (8, 4), (4, 2)):
        p = k - 1 - (k - u) // 2
        ct = nn.ConvTranspose(
            5, (k,), strides=(u,), padding=[(p, p)], transpose_kernel=True
        )
        sp = SubpixelConvTranspose(5, k, u)
        v = ct.init(rng, x)
        np.testing.assert_allclose(
            np.asarray(ct.apply(v, x)),
            np.asarray(sp.apply(v, x)),
            rtol=0,
            atol=1e-5,
        )


def test_generator_reference_init_policy():
    """r5: ups / resblock convs / conv_post init with normal(0, 0.01)
    like the reference (DEX-TTS/hifigan/models.py:10-13,146-147;
    bigvgan/models.py:19-22,181-183) — with flax's default lecun init
    the deep additive stacks are born tanh-saturated and from-scratch
    training never recovers (dead gradients; measured r5). conv_pre
    keeps the default init, as in the reference."""
    import jax

    from dex_tts_tpu.models.vocoder import (
        BigVGANConfig,
        BigVGANGenerator,
        HiFiGANConfig,
        HiFiGANGenerator,
    )

    mel = jnp.zeros((1, 8, 16))
    hifi = HiFiGANGenerator(HiFiGANConfig(
        num_mels=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
    ))
    p = hifi.init(jax.random.PRNGKey(0), mel)["params"]
    assert float(np.std(p["resblock_0_0"]["conv1_0"]["kernel"])) < 0.02
    assert float(np.std(p["up_0"]["kernel"])) < 0.02
    assert float(np.std(p["conv_post"]["kernel"])) < 0.02
    assert float(np.std(p["conv_pre"]["kernel"])) > 0.03  # default init

    big = BigVGANGenerator(BigVGANConfig(
        num_mels=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
    ))
    pb = big.init(jax.random.PRNGKey(0), mel)["params"]
    assert float(np.std(pb["resblock_0_0"]["conv1_0"]["kernel"])) < 0.02
    assert float(np.std(pb["up_0"]["kernel"])) < 0.02
    assert float(np.std(pb["conv_post"]["kernel"])) < 0.02
    assert float(np.std(pb["conv_pre"]["kernel"])) > 0.03
