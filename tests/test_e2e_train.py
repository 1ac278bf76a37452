"""End-to-end smoke: synthetic corpus → preprocess-format features →
main.py train (tiny config, few epochs) → loss decreases → checkpoints →
objective eval produces finite audio + metrics."""

import json
import os
import sys
import types

import jax
import numpy as np
import pytest

from dex_tts_tpu.utils import Config

pytestmark = pytest.mark.slow


def make_corpus(root, n=12, n_mels=16, seed=0):
    rng = np.random.default_rng(seed)
    mel_dir = os.path.join(root, "mel", "spk0")
    lf0_dir = os.path.join(root, "lf0", "spk0")
    wav_dir = os.path.join(root, "wav", "spk0")
    os.makedirs(mel_dir, exist_ok=True)
    os.makedirs(lf0_dir, exist_ok=True)
    os.makedirs(wav_dir, exist_ok=True)
    from dex_tts_tpu.audio.wav import write_wav

    texts = ["hello there", "see the cat", "go now", "a fine day today"]
    lines = []
    for i in range(n):
        t = 24 + int(rng.integers(0, 24))
        mel = rng.standard_normal((t, n_mels)).astype(np.float32) * 0.5
        lf0 = rng.standard_normal(t).astype(np.float32)
        lf0[::3] = 0.0
        mel_path = os.path.join(mel_dir, f"spk0-mel-{i:03d}.npy")
        np.save(mel_path, mel)
        np.save(os.path.join(lf0_dir, f"spk0-lf0-{i:03d}.npy"), lf0)
        # ground-truth wav at the preprocessor's layout (wav/{spk}/{base}.wav)
        write_wav(
            os.path.join(wav_dir, f"{i:03d}.wav"),
            rng.standard_normal(t * 256).astype(np.float32) * 0.1,
        )
        lines.append(f"{mel_path}|{texts[i % len(texts)]}|0")
    for name, subset in (("train.txt", lines[:8]), ("valid.txt", lines[8:])):
        with open(os.path.join(root, name), "w") as f:
            f.write("\n".join(subset))
    return root


def tiny_cfg(root, family):
    cfg = {
        "model_family": family,
        "dataset": "Tiny",
        "checkpoint": os.path.join(root, "checkpoints"),
        "path": {
            "train_path": os.path.join(root, "train.txt"),
            "val_path": os.path.join(root, "valid.txt"),
            "cmu_path": None,
            "vocoder_path": "",
        },
        "preprocess": {"sample_rate": 22050, "n_mels": 16, "n_fft": 1024,
                        "hop_length": 256, "win_length": 1024, "f_min": 0,
                        "f_max": 8000},
        "model": {
            "add_blank": True,
            "n_feats": 16,
            "n_spks": 1,
            "spk_emb_dim": 8,
            "encoder": {"n_channels": 24, "filter_channels": 32,
                         "filter_channels_dp": 16, "n_layers": 1,
                         "kernel_size": 3, "p_dropout": 0.1, "n_heads": 2,
                         "use_softmax": True, "use_decay": False},
            "decoder": {"dim": 8, "pe_scale": 1000, "dim_mults": [1, 2],
                         "loss_type": "base"},
            "dit": {"patch_size": 3, "stride_size": 2, "hidden_size": 16,
                     "depth": 1, "num_heads": 2, "mlp_ratio": 2,
                     "conv_pos": 4, "conv_pos_groups": 2},
            "tv_encoder": {"c_in": 16, "num_layer": 1, "c_h": 8, "c_out": 12,
                            "c_out_g": 12, "commit_w": 0.25, "n_emb": 8},
            "lf0_encoder": {"c_in": 1, "c_h": 8, "c_out": 12, "c_out_g": 12,
                             "num_layer": 1},
            "tiv_encoder": {"c_in": 16, "num_layer": 1, "c_h": 16, "c_out": 8},
        },
        "train": {"epoch": 2, "batch_size": 4, "save_epoch": 0,
                   "syn_every": 0, "fix_len": 0.25, "out_size": True,
                   "lr": 1e-3, "max_grad": 1, "ema_decay": 0.99,
                   "mask_ratio": 0, "aug_type": ["N", "N", "N"],
                   "x_quantum": 8, "y_quantum": 16},
        "test": {"ema": False, "n_timesteps": 2, "temperature": 1.5},
    }
    return Config(cfg)


def _load_main():
    """Load the repo's main.py by path — parity tests put the reference
    tree on sys.path, whose main.py would shadow ours."""
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "dex_tts_tpu_main", os.path.join(root, "main.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("family", ["gedex", "dex"])
def test_train_and_eval_end_to_end(tmp_path, family, monkeypatch):
    main_mod = _load_main()

    root = make_corpus(str(tmp_path))
    cfg = tiny_cfg(root, family)
    cfg_path = os.path.join(root, "cfg.yaml")
    cfg.dump(cfg_path)

    args = types.SimpleNamespace(
        config=cfg_path, seed=100, n_timesteps=2, resume=False, tag=None,
        test_checkpoint=None, test_file=None, sample_size=2, n_devices=None,
    )
    main_mod.train(args)

    exp_dirs = os.listdir(cfg.checkpoint)
    assert len(exp_dirs) == 1
    exp_dir = os.path.join(cfg.checkpoint, exp_dirs[0])
    log = open(os.path.join(exp_dir, "log.txt")).read().strip().splitlines()
    assert len(log) == 2
    # loss decreased across the 2 epochs
    losses = [float(line.split("total_loss=")[1].split(" ")[0]) for line in log]
    assert losses[1] < losses[0]
    assert os.path.isdir(os.path.join(exp_dir, "ckpt", "best-train"))
    assert os.path.isdir(os.path.join(exp_dir, "ckpt", "last"))

    # objective eval on the trained checkpoint. Fake ASR/speaker backends
    # exercise the full scoring wiring (WER/CER/speaker-cos) without the
    # optional pretrained models (reference: DEX-TTS/src/metric.py:15-95).
    from dex_tts_tpu.eval.evaluation import run_objective_eval

    class FakeASR:
        available = True

        def transcribe(self, wav, sample_rate=22050):
            return "hello there friend"

    class FakeSpk:
        available = True
        calls = []

        def cosine(self, wav_a, wav_b, sample_rate=22050):
            self.calls.append((len(wav_a), len(wav_b)))
            return 0.87

    fake_spk = FakeSpk()
    report = run_objective_eval(
        Config(cfg_path), exp_dir=exp_dir, sample_size=1, n_timesteps=2,
        asr=FakeASR(), spk_scorer=fake_spk,
    )
    assert "mel_mae" in report
    assert np.isfinite(report["mel_mae"][0])
    assert "mcd" in report and report["mcd"][0] > 0  # DTW spectral metric
    for name in ("wer", "cer", "cos"):
        assert name in report, report
    assert report["cos"][0] == pytest.approx(0.87)
    assert fake_spk.calls and all(a > 0 and b > 0 for a, b in fake_spk.calls)
    assert os.path.isfile(os.path.join(exp_dir, "eval", "000_syn.wav"))
    # the GT wav (not the mel .npy) was copied next to the synthesis
    assert os.path.isfile(os.path.join(exp_dir, "eval", "000_ref.wav"))


def test_synthesize_cli_end_to_end(tmp_path, monkeypatch):
    """The one-shot synthesize.py CLI against a trained tiny GeDEX
    checkpoint writes a finite 22.05 kHz wav
    (reference: DEX-TTS/synthesize.py:115-138, GeDEX-TTS/synthesize.py)."""
    import importlib.util

    root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "dex_tts_tpu_synthesize", os.path.join(root_dir, "synthesize.py")
    )
    syn_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(syn_mod)
    main_mod = _load_main()

    root = make_corpus(str(tmp_path))
    cfg = tiny_cfg(root, "gedex")
    cfg_path = os.path.join(root, "cfg.yaml")
    cfg.dump(cfg_path)
    args = types.SimpleNamespace(
        config=cfg_path, seed=100, n_timesteps=2, resume=False, tag=None,
        test_checkpoint=None, test_file=None, sample_size=2, n_devices=None,
    )
    main_mod.train(args)
    exp_dir = os.path.join(cfg.checkpoint, os.listdir(cfg.checkpoint)[0])

    out_dir = os.path.join(root, "synth_out")
    argv = [
        "synthesize.py", "--config", cfg_path, "--weight_path", exp_dir,
        "--input_text", "hello there", "--n_timesteps", "2",
        "--out_dir", out_dir,
    ]
    monkeypatch.setattr(sys, "argv", argv)
    syn_mod.main()
    wav_path = os.path.join(out_dir, "sample.wav")
    assert os.path.isfile(wav_path)
    from dex_tts_tpu.audio.wav import read_wav

    wav, sr = read_wav(wav_path)
    assert sr == 22050 and len(wav) > 0 and np.isfinite(wav).all()


def test_load_synthesizer_from_reference_torch_checkpoint(tmp_path):
    """Migration path: point load_synthesizer at a reference-format
    experiment dir (model-train-best.pth, dict
    {'scores','state_dict','ema','optimizer'} — reference:
    DEX-TTS/src/train.py:112-122) and synthesize without any orbax
    checkpoint; test.ema selects the 'ema' weights."""
    import torch

    from dex_tts_tpu.eval.evaluation import load_synthesizer
    from tests.torch_twins import GeDEXTTSTwin

    root = str(tmp_path)
    make_corpus(root)
    cfg = tiny_cfg(root, "gedex")

    torch.manual_seed(0)
    twin = GeDEXTTSTwin(
        n_vocab=149, n_feats=16, channels=24, heads=2, layers=1, ffn=32,
        dp_channels=16, dim=8, n_spks=1, spk_emb_dim=8,
        dit_kwargs=dict(patch=3, stride=2, hidden=16, depth=1, num_heads=2,
                        mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2),
    )
    state_dict = twin.state_dict()
    ema = {k: v + 0.01 for k, v in state_dict.items()}
    exp_dir = str(tmp_path / "torch_exp")
    os.makedirs(exp_dir)
    torch.save(
        {"scores": [0.0], "state_dict": state_dict, "ema": ema,
         "optimizer": {}},
        os.path.join(exp_dir, "model-train-best.pth"),
    )

    synth, _ = load_synthesizer(cfg, exp_dir, n_timesteps=2)
    emb = np.asarray(synth.variables["params"]["encoder"]["emb"]["embedding"])
    np.testing.assert_allclose(emb, state_dict["encoder.emb.weight"].numpy())
    out = synth.tts(["migrated weights"], key=jax.random.PRNGKey(0),
                    vocode=False)
    assert np.isfinite(out[0]["mel"]).all()

    cfg.test.ema = True
    synth_ema, _ = load_synthesizer(cfg, exp_dir, n_timesteps=2)
    emb_ema = np.asarray(
        synth_ema.variables["params"]["encoder"]["emb"]["embedding"]
    )
    np.testing.assert_allclose(emb_ema, emb + 0.01, atol=1e-6)

    # a bare .pth path works too
    synth2, _ = load_synthesizer(
        cfg, os.path.join(exp_dir, "model-train-best.pth"), n_timesteps=2
    )
    assert synth2 is not None


def test_train_warm_start_from_torch_checkpoint(tmp_path):
    """--init_from: fine-tuning a reference-trained torch checkpoint —
    params/EMA convert into the fresh TrainState (optimizer fresh), and
    main.py train runs on top of them."""
    import torch

    from tests.torch_twins import GeDEXTTSTwin

    main_mod = _load_main()
    root = make_corpus(str(tmp_path))
    cfg = tiny_cfg(root, "gedex")
    cfg.train.epoch = 1
    cfg_path = os.path.join(root, "cfg.yaml")
    cfg.dump(cfg_path)

    torch.manual_seed(0)
    twin = GeDEXTTSTwin(
        n_vocab=149, n_feats=16, channels=24, heads=2, layers=1, ffn=32,
        dp_channels=16, dim=8, n_spks=1, spk_emb_dim=8,
        dit_kwargs=dict(patch=3, stride=2, hidden=16, depth=1, num_heads=2,
                        mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2),
    )
    ref_exp = str(tmp_path / "ref_exp")
    os.makedirs(ref_exp)
    sd = twin.state_dict()
    ema = {k: v + 0.5 for k, v in sd.items()}
    torch.save(
        {"scores": [0.0], "state_dict": sd, "ema": ema, "optimizer": {}},
        os.path.join(ref_exp, "model-last.pth"),
    )

    # unit: converted params and (distinct) EMA land in the state
    from dex_tts_tpu.config import build_model
    from dex_tts_tpu.data import TextMelDataset
    from dex_tts_tpu.train import create_train_state

    model = build_model(cfg)
    ds = TextMelDataset(cfg.path.val_path, add_blank=True, load_style=False)
    item = ds[0]
    batch = {
        "x": item["x"][None],
        "x_lengths": np.asarray([len(item["x"])], np.int32),
        "y": item["y"][None],
        "y_lengths": np.asarray([item["y"].shape[1]], np.int32),
    }
    state, _ = create_train_state(model, batch)
    state = main_mod.warm_start_state(state, model, ref_exp)
    emb = np.asarray(state.params["encoder"]["emb"]["embedding"])
    np.testing.assert_allclose(emb, sd["encoder.emb.weight"].numpy())
    emb_ema = np.asarray(state.ema_params["encoder"]["emb"]["embedding"])
    np.testing.assert_allclose(emb_ema, emb + 0.5, atol=1e-6)

    # smoke: a full training epoch on top of the warm start
    args = types.SimpleNamespace(
        config=cfg_path, seed=100, n_timesteps=2, resume=False, tag=None,
        test_checkpoint=None, test_file=None, sample_size=2, n_devices=None,
        init_from=ref_exp,
    )
    main_mod.train(args)
    exp_dir = os.path.join(cfg.checkpoint, os.listdir(cfg.checkpoint)[0])
    assert os.path.isdir(os.path.join(exp_dir, "ckpt", "last"))


def test_load_synthesizer_from_torch_checkpoint_dex(tmp_path):
    """DEX variant of the torch-checkpoint fallback: the converted
    variables carry the BatchNorm and VQ-EMA collections (TIV/TV
    encoders), and styled synthesis runs on them."""
    import torch

    from dex_tts_tpu.eval.evaluation import load_synthesizer
    from tests.torch_twins import TTSTwin

    root = make_corpus(str(tmp_path))
    cfg = tiny_cfg(root, "dex")
    # the reference architecture ties tv/lf0 c_out to the encoder width
    # (sty_enc feeds AdaLN Linear(width, width)); the torch twin enforces
    # that, so align the tiny cfg with it
    cfg.model.tv_encoder.c_out = 24
    cfg.model.lf0_encoder.c_out = 24

    torch.manual_seed(0)
    twin = TTSTwin(
        n_vocab=149, n_feats=16, channels=24, heads=2, layers=1, ffn=32,
        dp_channels=16, dim=8,
        dit_kwargs=dict(patch=3, stride=2, hidden=16, depth=1, num_heads=2,
                        mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2),
        tv_kwargs=dict(c_h=8, c_out=24, c_out_g=12, num_layer=1, n_emb=8),
        tiv_kwargs=dict(c_h=16, c_out=8, num_layer=1),
        lf0_kwargs=dict(c_h=8, c_out=24, c_out_g=12, num_layer=1),
    )
    exp_dir = str(tmp_path / "torch_exp")
    os.makedirs(exp_dir)
    torch.save(
        {"scores": [0.0], "state_dict": twin.state_dict(),
         "ema": twin.state_dict(), "optimizer": {}},
        os.path.join(exp_dir, "model-last.pth"),
    )

    synth, ds = load_synthesizer(cfg, exp_dir, n_timesteps=2, tag="last")
    assert synth.variables["batch_stats"], "BN stats missing from fallback"
    assert synth.variables["vq_stats"], "VQ stats missing from fallback"
    item = ds.eval_item(0)
    out = synth.tts(
        ["dex migrated"], key=jax.random.PRNGKey(0),
        ref_feats=[(item["ref"], item["lf0"])], vocode=False,
    )
    assert np.isfinite(out[0]["mel"]).all()
