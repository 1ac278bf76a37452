"""flax→torch export (export.py): exact inverse of convert.py.

Validates (a) bitwise flax→torch→flax roundtrips through the
independently-parity-verified forward converters, (b) strict
load_state_dict into the reference-named torch twins / actual reference
generators, and (c) the export_torch.py CLI loop: orbax checkpoint →
reference-format .pth → back through load_synthesizer's torch path.
"""

import os
import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dex_tts_tpu.convert import (  # noqa: E402
    bigvgan_torch_to_flax,
    dex_tts_torch_to_flax,
    fold_weight_norm,
    hifigan_torch_to_flax,
)
from dex_tts_tpu.export import (  # noqa: E402
    bigvgan_flax_to_torch,
    dex_tts_flax_to_torch,
    hifigan_flax_to_torch,
    split_weight_norm,
)

REF = "/root/reference/DEX-TTS"


def assert_tree_equal(a, b, path=""):
    assert type(a) is type(b) or isinstance(a, dict) == isinstance(b, dict), path
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
        for k in a:
            assert_tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=path
        )


def torch_load_strict(module, state, allowed_missing_suffix=None):
    """strict load; optionally tolerate ONLY missing buffer keys with the
    given suffix (deterministic architecture constants, e.g. BigVGAN's
    Kaiser anti-aliasing filters, which the reference recomputes at
    construction — reference: bigvgan/alias_free_torch/filter.py)."""
    tensors = {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()
    }
    if allowed_missing_suffix is None:
        module.load_state_dict(tensors, strict=True)
        return
    result = module.load_state_dict(tensors, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    bad = [k for k in result.missing_keys
           if not k.endswith(allowed_missing_suffix)]
    assert not bad, bad


# ---------------------------------------------------------------------------
# TTS facades


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo absent")
def test_dex_export_roundtrip_and_strict_twin_load():
    from tests.test_parity_tts_full import build_pair

    twin, model, variables = build_pair()
    exported = dex_tts_flax_to_torch(variables, model)

    # strict load into a fresh reference-named twin: key/shape-complete
    from tests.torch_twins import TTSTwin
    from tests.test_parity_tts_full import (
        C, DIM, DIT_KW, DP, FFN, HEADS, LAYERS, N_FEATS, N_VOCAB,
    )

    twin2 = TTSTwin(
        n_vocab=N_VOCAB, n_feats=N_FEATS, channels=C, heads=HEADS,
        layers=LAYERS, ffn=FFN, dp_channels=DP, dim=DIM, dit_kwargs=DIT_KW,
    )
    torch_load_strict(twin2, exported)

    # bitwise roundtrip through the parity-verified forward converter
    assert_tree_equal(dex_tts_torch_to_flax(exported, model), variables)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo absent")
def test_gedex_export_roundtrip_and_strict_twin_load():
    from tests.test_parity_tts_full import build_gedex_pair

    twin, model, variables = build_gedex_pair()
    exported = dex_tts_flax_to_torch(variables, model)

    from tests.torch_twins import GeDEXTTSTwin
    from tests.test_parity_tts_full import (
        C, DIM, DIT_KW, DP, FFN, HEADS, LAYERS, N_FEATS, N_SPKS, N_VOCAB,
        SPK_DIM,
    )

    twin2 = GeDEXTTSTwin(
        n_vocab=N_VOCAB, n_feats=N_FEATS, channels=C, heads=HEADS,
        layers=LAYERS, ffn=FFN, dp_channels=DP, dim=DIM, n_spks=N_SPKS,
        spk_emb_dim=SPK_DIM, dit_kwargs=DIT_KW,
    )
    torch_load_strict(twin2, exported)

    got = dex_tts_torch_to_flax(exported, model)
    # a GeDEX tree has no batch_stats/vq_stats; the converter emits only
    # the sections that exist
    assert_tree_equal(got, variables)


# ---------------------------------------------------------------------------
# Vocoders: exported dicts load into the ACTUAL reference generators


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "hifigan")),
    reason="reference repo absent",
)
def test_hifigan_export_loads_into_reference_generator():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from hifigan.models import Generator as RefGenerator

    from dex_tts_tpu.models.vocoder import HiFiGANConfig, HiFiGANGenerator

    # reference Generator hardcodes 80 input mels and ResBlock1 hardcodes
    # 3 dilation branches (hifigan/models.py:36-52,118)
    cfg = HiFiGANConfig(
        num_mels=80,
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    )
    model = HiFiGANGenerator(cfg)
    mel = np.random.default_rng(0).standard_normal((1, 80, 13)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), mel)["params"]
    want = np.asarray(model.apply({"params": params}, mel))

    exported = hifigan_flax_to_torch(params, cfg)  # weight-normed
    assert any(k.endswith("weight_g") for k in exported)

    class H(dict):
        __getattr__ = dict.__getitem__

    ref = RefGenerator(H(
        resblock="1",
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        upsample_initial_channel=cfg.upsample_initial_channel,
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        num_mels=cfg.num_mels,
    ))
    torch_load_strict(ref, exported)
    ref.remove_weight_norm()
    ref.eval()
    with torch.no_grad():
        got = ref(torch.from_numpy(mel)).numpy()[:, 0, :]
    np.testing.assert_allclose(got, want, atol=2e-5)

    # and the roundtrip back through the forward converter is bitwise
    # modulo the weight-norm split/fold (float32 re-normalization)
    back = hifigan_torch_to_flax(exported, cfg)
    assert jax.tree.structure(back) == jax.tree.structure(
        jax.tree.map(np.asarray, params)
    )
    for leaf_a, leaf_b in zip(
        jax.tree.leaves(back), jax.tree.leaves(jax.tree.map(np.asarray, params)),
        strict=True,
    ):
        np.testing.assert_allclose(leaf_a, leaf_b, rtol=1e-6, atol=1e-7)


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "bigvgan")),
    reason="reference repo absent",
)
def test_bigvgan_export_loads_into_reference_generator():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from bigvgan.models import BigVGAN as RefBigVGAN

    from dex_tts_tpu.models.vocoder.bigvgan import BigVGANConfig, BigVGANGenerator

    cfg = BigVGANConfig(
        num_mels=8,
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    )
    model = BigVGANGenerator(cfg)
    mel = np.random.default_rng(1).standard_normal((1, 8, 13)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1), mel)["params"]
    want = np.asarray(model.apply({"params": params}, mel))

    exported = bigvgan_flax_to_torch(params, cfg)

    class H(dict):
        __getattr__ = dict.__getitem__

    ref = RefBigVGAN(H(
        num_mels=cfg.num_mels,
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        upsample_initial_channel=cfg.upsample_initial_channel,
        resblock="1",
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        activation=cfg.activation,
        snake_logscale=cfg.snake_logscale,
    ))
    torch_load_strict(ref, exported, allowed_missing_suffix=".filter")
    ref.remove_weight_norm()
    ref.eval()
    with torch.no_grad():
        got = ref(torch.from_numpy(mel)).numpy()[:, 0, :]
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_dit_decoder_variant_export_matches_twin_state():
    """The use_decoder=True DiT subtree exports key-complete and bitwise
    (no GRU-style bias redistribution in this subtree, so direct equality
    against the twin's state_dict holds)."""
    from dex_tts_tpu.convert import _dit as dit_fwd
    from dex_tts_tpu.export import _dit as dit_inv
    from tests.torch_twins import DiTTwin

    kw = dict(patch=3, stride=2, hidden=16, depth=2, num_heads=2,
              mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2)
    torch.manual_seed(3)
    twin = DiTTwin(6, grid_h=4, use_decoder=True, **kw)
    state = {f"vit.{k}": v.numpy() for k, v in twin.state_dict().items()}
    tree = dit_fwd(state, "vit", depth=kw["depth"], use_decoder=True)
    out = {}
    dit_inv(out, tree, "vit", depth=kw["depth"], use_decoder=True)
    assert set(out) == set(state)
    for k in state:
        np.testing.assert_array_equal(out[k], state[k], err_msg=k)


def test_split_weight_norm_inverts_fold():
    rng = np.random.default_rng(2)
    state = {
        "a.weight": rng.standard_normal((4, 3, 5)).astype(np.float32),
        "a.bias": rng.standard_normal(4).astype(np.float32),
        "act.alpha": rng.standard_normal(4).astype(np.float32),
    }
    split = split_weight_norm(state)
    assert set(split) == {"a.weight_g", "a.weight_v", "a.bias", "act.alpha"}
    folded = fold_weight_norm(split)
    np.testing.assert_allclose(
        folded["a.weight"], state["a.weight"], rtol=1e-6, atol=1e-7
    )
    np.testing.assert_array_equal(folded["a.bias"], state["a.bias"])


# ---------------------------------------------------------------------------
# CLI loop: orbax → export_torch.py → load_synthesizer's torch path


def test_export_cli_roundtrip_through_pipeline(tmp_path):
    import importlib.util

    from tests.test_e2e_train import _load_main, make_corpus, tiny_cfg

    from dex_tts_tpu.utils import Config

    root = make_corpus(str(tmp_path))
    cfg = tiny_cfg(root, "gedex")
    cfg_path = os.path.join(root, "cfg.yaml")
    cfg.dump(cfg_path)

    import types

    main_mod = _load_main()
    main_mod.train(types.SimpleNamespace(
        config=cfg_path, seed=100, n_timesteps=2, resume=False, tag=None,
        test_checkpoint=None, test_file=None, sample_size=2, n_devices=None,
    ))
    exp_dir = os.path.join(cfg.checkpoint, os.listdir(cfg.checkpoint)[0])

    root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "dex_tts_tpu_export_cli", os.path.join(root_dir, "export_torch.py")
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    out = os.path.join(root, "exported", "model-last.pth")
    os.makedirs(os.path.dirname(out))
    argv_save = sys.argv
    sys.argv = ["export_torch.py", "--config", cfg_path,
                "--weight_path", exp_dir, "--tag", "last", "--out", out]
    try:
        cli.main()
    finally:
        sys.argv = argv_save

    ckpt = torch.load(out, map_location="cpu", weights_only=True)
    assert set(ckpt) == {"state_dict", "ema"}

    # the exported file round-trips through our own torch-checkpoint
    # migration path: a fresh exp dir holding only the .pth synthesizes
    from dex_tts_tpu.eval.evaluation import load_synthesizer

    exp2 = os.path.join(root, "exp_torch_only")
    os.makedirs(exp2)
    os.replace(out, os.path.join(exp2, "model-last.pth"))
    synth, _ = load_synthesizer(Config(cfg_path), exp2, n_timesteps=2)
    res = synth.tts(["hello there"], key=jax.random.PRNGKey(0), vocode=False)
    assert np.isfinite(res[0]["mel"]).all()
