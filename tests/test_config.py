import os

from dex_tts_tpu.utils import Config, DotDict, load_config


def test_dotdict_access_and_nesting():
    d = DotDict({"a": 1, "b": {"c": [1, {"d": 2}]}})
    assert d.a == 1
    assert d.b.c[1].d == 2
    d.b.e = {"f": 3}
    assert d.b.e.f == 3


def test_deep_update():
    d = DotDict({"model": {"dim": 64, "heads": 2}, "lr": 1e-4})
    d.deep_update({"model": {"dim": 128}, "tag": "x"})
    assert d.model.dim == 128
    assert d.model.heads == 2
    assert d.tag == "x"


def test_build_model_threads_lowering_knobs():
    """pos_conv_impl / linattn_impl YAML knobs reach the model (exact-math
    lowering A/B via config, scripts/perf_variants_e2e.py)."""
    from dex_tts_tpu.config import build_model, load_preset

    cfg = load_preset("vctk")
    cfg.model.dit.pos_conv_impl = "vmap"
    cfg.model.decoder.linattn_impl = "fused"
    model = build_model(cfg)
    assert model.dit.pos_conv_impl == "vmap"
    assert model.linattn_impl == "fused"

    # measured defaults when unset (scripts/perf_variants_e2e.py: fused
    # linattn 1.052x e2e; pos_conv lowerings a wash -> grouped)
    model = build_model(load_preset("vctk"))
    assert model.dit.pos_conv_impl == "grouped"
    assert model.linattn_impl == "fused"


def test_config_yaml_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "c.yaml")
    with open(path, "w") as f:
        f.write("model:\n  dim: 64\ntrain:\n  lr: 0.0001\n")
    cfg = load_config(path, overrides={"train": {"lr": 0.001}})
    assert cfg.model.dim == 64
    assert cfg.train.lr == 0.001
    out = os.path.join(tmp_path, "out.yaml")
    cfg.dump(out)
    cfg2 = Config(out)
    assert cfg2.to_dict() == cfg.to_dict()
