"""Objective evaluation: synthesize test sentences, write wavs, score.

Capability equivalent of reference: DEX-TTS/src/evaluation.py:20-149
(test() + Tester.synthesize): loads the best checkpoint (EMA per
cfg.test.ema), synthesizes dataset sentences, vocodes, writes 22.05 kHz
int16 wavs next to copies of the ground truth, and reports mel-MAE always
plus CER/WER/speaker-cos when their optional backends are available.
"""

from __future__ import annotations

import os
import shutil

import jax
import numpy as np

from dex_tts_tpu.audio.wav import write_wav
from dex_tts_tpu.config import build_model
from dex_tts_tpu.data import TextMelDataset
from dex_tts_tpu.eval.metric import (
    ASRScorer,
    SpeakerScorer,
    cer,
    mean_and_stderr,
    mel_cepstral_distortion,
    mel_mae,
    wer,
)
from dex_tts_tpu.models.edm import SamplerConfig
from dex_tts_tpu.models.vocoder import HiFiGANGenerator
from dex_tts_tpu.pipeline import Synthesizer
from dex_tts_tpu.train.checkpoint import CheckpointManager
from dex_tts_tpu.train.state import create_train_state


def gt_wav_path(filelist_path: str) -> str:
    """Ground-truth wav path for a filelist entry.

    Filelists store the mel path ``.../mel/{spk}/{spk}-mel-{base}.npy``; the
    preprocessor writes the trimmed wav next to it at
    ``.../wav/{spk}/{base}.wav`` (preprocessor.py:181-183). Entries that
    already point at a wav are returned unchanged
    (reference: DEX-TTS/src/evaluation.py:60-67 copies GT wavs)."""
    if filelist_path.endswith(".wav"):
        return filelist_path
    d, name = os.path.split(filelist_path.replace("/mel/", "/wav/"))
    if "-mel-" in name and name.endswith(".npy"):
        base = name.split("-mel-", 1)[1][: -len(".npy")]
        return os.path.join(d, base + ".wav")
    return ""


def load_vocoder(cfg, strict: bool = False):
    """HiFi-GAN or BigVGAN (per cfg.vocoder) with converted torch weights
    when present, else random init (useful for smoke runs). With
    ``strict=True`` a missing checkpoint raises instead of falling back to
    random init (used by export tooling, where silently shipping untrained
    weights would be a trap). reference: DEX-TTS/src/utils.py:251-281."""
    from dex_tts_tpu.convert import (
        bigvgan_torch_to_flax,
        hifigan_torch_to_flax,
        load_torch_checkpoint,
    )
    from dex_tts_tpu.models.vocoder.bigvgan import BigVGANConfig, BigVGANGenerator
    from dex_tts_tpu.models.vocoder.hifigan import HiFiGANConfig

    n_mels = int(cfg.get("preprocess", {}).get("n_mels", 80))
    kind = str(cfg.get("vocoder", "hifigan")).lower()
    path = cfg.path.get("vocoder_path", "")

    # honor a config.json next to the checkpoint, as the reference's
    # AttrDict(json) loader does (reference: DEX-TTS/src/utils.py:255-262)
    arch = {}
    cfg_json = os.path.join(path, "config.json") if path else ""
    if os.path.isfile(cfg_json):
        import json

        with open(cfg_json) as f:
            j = json.load(f)
        keys = (
            "num_mels", "upsample_rates", "upsample_kernel_sizes",
            "upsample_initial_channel", "resblock_kernel_sizes",
            "resblock_dilation_sizes",
        ) + (("activation", "snake_logscale") if kind == "bigvgan" else ())
        arch = {
            k: tuple(tuple(e) if isinstance(e, list) else e for e in j[k])
            if isinstance(j[k], list)
            else j[k]
            for k in keys
            if k in j
        }
    arch.setdefault("num_mels", n_mels)

    # flax-native generator checkpoint written by train_vocoder.py
    # (orbax dir `gen_last`/`gen_best` holding the raw params pytree) —
    # takes precedence over converted torch weights
    orbax_tag = None
    if path:
        for t in ("gen_best", "gen_last"):
            if os.path.isdir(os.path.join(path, t)):
                orbax_tag = t
                break

    if cfg.get("vocoder_upsample_impl"):
        arch["upsample_impl"] = str(cfg.vocoder_upsample_impl)
    # "auto" (the default when the key is unset) = the measured
    # per-vocoder winner on TPU: bf16 BigVGAN with fold snake + poly
    # sin² (quality receipt on a TRAINED generator: 46.4 dB SNR vs f32,
    # mel-MAE vs target identical to 3 decimals —
    # scripts/receipt_bigvgan_dtype.py, BENCH_SWEEP r5), f32 HiFi-GAN.
    # One consistent default across bench.py / serving / this loader
    # (VERDICT r4 item 3); force "float32" for checkpoint-exact output.
    dt = str(cfg.get("vocoder_dtype") or "auto")
    if dt == "auto":
        dt = (
            "bfloat16"
            if kind == "bigvgan" and jax.default_backend() == "tpu"
            else "float32"
        )
    arch["dtype"] = dt
    if kind == "bigvgan":
        # optional TPU knobs (see ops/snake.py, BigVGANConfig)
        if cfg.get("vocoder_snake_pallas"):
            arch["snake_pallas"] = bool(cfg.vocoder_snake_pallas)
        if cfg.get("vocoder_snake_impl"):
            arch["snake_impl"] = str(cfg.vocoder_snake_impl)
        voc = BigVGANGenerator(BigVGANConfig(**arch))
        candidates = [os.path.join(path, "g_05000000"), path] if path else []
        convert = bigvgan_torch_to_flax
    else:
        voc = HiFiGANGenerator(HiFiGANConfig(**arch))
        candidates = (
            [
                os.path.join(path, "generator_LJSpeech.pth.tar.zip"),
                os.path.join(path, "generator_universal.pth.tar.zip"),
                os.path.join(path, "generator_universal.pth.tar"),
                path,
            ]
            if path
            else []
        )
        convert = hifigan_torch_to_flax
    if orbax_tag:
        import jax.numpy as jnp
        import orbax.checkpoint as ocp

        target = jax.eval_shape(
            voc.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, arch["num_mels"], 16)),
        )["params"]
        params = ocp.StandardCheckpointer().restore(
            os.path.abspath(os.path.join(path, orbax_tag)), target
        )
        return voc, params
    for cand in candidates:
        if os.path.isfile(cand):
            params = convert(load_torch_checkpoint(cand), voc.cfg)
            return voc, params
    if strict:
        raise FileNotFoundError(
            f"no {kind} checkpoint found under cfg.path.vocoder_path="
            f"{path!r} (tried orbax gen_best/gen_last and "
            f"{candidates or 'no torch candidates (path unset)'})"
        )
    import jax.numpy as jnp

    params = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, n_mels, 16)))["params"]
    return voc, params


def _find_torch_tts_checkpoint(exp_dir: str, tag: str) -> str | None:
    """Locate a reference-format torch TTS checkpoint for a tag.

    Migration path: a user coming from the reference can point our CLIs
    straight at their trained experiment dir (or a .pth file); naming per
    reference DEX-TTS/src/train.py:112-122 (model-{train,val}-best.pth,
    model-last.pth, model-{epoch}.pth)."""
    if os.path.isfile(exp_dir):
        return exp_dir
    names = {
        "best-train": "model-train-best.pth",
        "best-val": "model-val-best.pth",
        "last": "model-last.pth",
    }
    cands = [names.get(tag, f"model-{tag}.pth")]
    if tag == "best-train":
        # the default tag: any reference checkpoint qualifies (reference
        # runs always have model-last.pth; bests only when val improved)
        cands += ["model-val-best.pth", "model-last.pth"]
    for name in cands:
        cand = os.path.join(exp_dir, name)
        if os.path.isfile(cand):
            return cand
    return None


def _val_dataset(cfg):
    return TextMelDataset(
        cfg.path.val_path,
        cmu_path=cfg.path.get("cmu_path"),
        add_blank=cfg.model.get("add_blank", True),
        load_style=cfg.get("model_family", "dex") == "dex",
    )


def _synthetic_init_batch(cfg):
    """Dataset-free init batch: `model.init` only needs shapes/dtypes,
    so a missing filelist must not block `synthesize.py`/`serve.py`
    (the reference CLI needs no dataset either —
    reference: DEX-TTS/synthesize.py:64-113)."""
    n_feats = int(cfg.model.n_feats)
    batch = {
        "x": np.ones((1, 9), np.int32),
        "x_lengths": np.asarray([9], np.int32),
        "y": np.zeros((1, n_feats, 64), np.float32),
        "y_lengths": np.asarray([64], np.int32),
    }
    if cfg.get("model_family", "dex") == "dex":
        batch.update(
            ref=np.zeros((1, n_feats, 64), np.float32),
            ref_lengths=np.asarray([64], np.int32),
            sty=np.zeros((1, n_feats, 64), np.float32),
            sty_lengths=np.asarray([64], np.int32),
            lf0=np.zeros((1, 64), np.float32),
            lf0_lengths=np.asarray([64], np.int32),
        )
    return batch


def build_init_batch(cfg, ds=None):
    """Batch-of-1 init batch (first val item) for tracing `model.init` —
    shared by load_synthesizer and the export CLI; only shapes/dtypes
    matter. Falls back to a synthetic batch when the config's val
    filelist is absent (synthesize/serve must not require a prepared
    dataset)."""
    if ds is None:
        try:
            ds = _val_dataset(cfg)
        except (FileNotFoundError, OSError):
            return _synthetic_init_batch(cfg)
    item = ds[0]
    batch = {
        "x": item["x"][None],
        "x_lengths": np.asarray([len(item["x"])], np.int32),
        "y": item["y"][None],
        "y_lengths": np.asarray([item["y"].shape[1]], np.int32),
    }
    if "ref" in item:
        t = item["ref"].shape[1]
        batch.update(
            ref=item["ref"][None],
            ref_lengths=np.asarray([t], np.int32),
            sty=item["sty"][None],
            sty_lengths=np.asarray([t], np.int32),
            lf0=item["lf0"][None],
            lf0_lengths=np.asarray([len(item["lf0"])], np.int32),
        )
    return batch


def load_synthesizer(cfg, exp_dir: str, n_timesteps: int = 50, tag: str = "best-train",
                     dit_cache_interval: int = 1, solver: str = "euler"):
    if dit_cache_interval > 1 and n_timesteps % dit_cache_interval:
        # fail fast at startup — otherwise a misconfigured server boots
        # healthy and 500s every request at first-trace time
        raise ValueError(
            f"n_timesteps {n_timesteps} must be a multiple of "
            f"dit_cache_interval {dit_cache_interval}"
        )
    if solver not in ("euler", "heun", "dpmpp2m"):
        raise ValueError(f"unknown solver {solver!r}")
    if solver != "euler" and dit_cache_interval > 1:
        raise ValueError("dit_cache_interval>1 requires the euler solver")
    model = build_model(cfg)
    try:
        ds = _val_dataset(cfg)
    except (FileNotFoundError, OSError):
        ds = None  # dataset-free synth/serve: synthetic init batch
    batch = build_init_batch(cfg, ds)
    use_ema = bool(cfg.get("test", {}).get("ema", False))
    torch_ckpt = (
        None
        if os.path.isdir(os.path.join(exp_dir, "ckpt"))  # native orbax wins
        else _find_torch_tts_checkpoint(exp_dir, tag)
    )
    if torch_ckpt is not None:
        # reference-trained weights, converted on the fly (convert.py)
        from dex_tts_tpu.convert import (
            dex_tts_torch_to_flax,
            load_torch_trainer_checkpoint,
        )

        state_dict, ema_dict = load_torch_trainer_checkpoint(torch_ckpt)
        if use_ema:
            if ema_dict is None:
                # bare state_dict or trainer dict without 'ema' — degrade
                # loudly, not silently: the config asked for EMA weights
                import warnings

                warnings.warn(
                    f"test.ema=true but {torch_ckpt} has no 'ema' weights; "
                    "using the raw state_dict"
                )
            else:
                state_dict = ema_dict
        variables = dict(dex_tts_torch_to_flax(state_dict, model))
        variables.setdefault("batch_stats", {})
        variables.setdefault("vq_stats", {})
    else:
        state, _ = create_train_state(model, batch)
        mgr = CheckpointManager(os.path.join(exp_dir, "ckpt"))
        if mgr.exists(tag):
            state = mgr.restore(state, tag)
        else:
            # loud, not fatal: random-init synthesis is the documented
            # smoke path (finite-audio check without any checkpoint)
            import warnings

            warnings.warn(
                f"no checkpoint {tag!r} under {exp_dir}/ckpt and no torch "
                ".pth found — synthesizing with RANDOM-INIT weights "
                "(smoke/debug only; output is noise)"
            )
        variables = {
            "params": state.ema_params if use_ema else state.params,
            "batch_stats": state.batch_stats,
            "vq_stats": state.vq_stats,
        }
    voc, voc_params = load_vocoder(cfg)
    return Synthesizer(
        model,
        variables,
        vocoder=voc,
        vocoder_params=voc_params,
        cmu_path=cfg.path.get("cmu_path"),
        add_blank=cfg.model.get("add_blank", True),
        sampler=SamplerConfig(
            num_steps=n_timesteps, solver=solver,
            dit_cache_interval=dit_cache_interval,
        ),
    ), ds


def run_objective_eval(
    cfg,
    exp_dir: str,
    sample_size: int = 10,
    n_timesteps: int = 50,
    test_file: str | None = None,
    seed: int = 0,
    asr: ASRScorer | None = None,
    spk_scorer: SpeakerScorer | None = None,
    dit_cache_interval: int = 1,
    solver: str = "euler",
    spk_encoder: str | None = None,
):
    """asr/spk_scorer are injectable so tests can exercise the scoring
    wiring without the optional pretrained backends. spk_encoder is a
    path to resemblyzer's pretrained.pt for the built-in GE2E speaker
    backend (eval/speaker.py) when the package itself is absent.

    dit_cache_interval > 1 evaluates the approximate turbo sampler — run
    it against the exact default to quantify the quality cost (mel-MAE,
    CER/WER, speaker-cos) on your own trained model before serving it.
    solver="dpmpp2m" evaluates the 2nd-order multistep solver the same
    way (e.g. --n_timesteps 16 vs the 50-step euler baseline)."""
    synth, ds = load_synthesizer(
        cfg, exp_dir, n_timesteps, dit_cache_interval=dit_cache_interval,
        solver=solver,
    )
    out_dir = os.path.join(exp_dir, "eval")
    os.makedirs(out_dir, exist_ok=True)

    asr = asr if asr is not None else ASRScorer()
    spk_scorer = spk_scorer if spk_scorer is not None else SpeakerScorer(
        weights=spk_encoder
    )
    maes, mcds, wers, cers, coss = [], [], [], [], []

    if test_file:
        with open(test_file) as f:
            sentences = [line.strip() for line in f if line.strip()]
        items = [{"raw_text": s} for s in sentences[:sample_size]]
    else:
        if ds is None:
            raise FileNotFoundError(
                f"objective eval needs the val filelist "
                f"({cfg.path.val_path}); synthesize/serve run without a "
                "dataset, but `main.py test` scores against real items — "
                "or pass --test_file for text-only synthesis"
            )
        items = [ds.eval_item(i) for i in range(min(sample_size, len(ds)))]

    key = jax.random.PRNGKey(seed)
    for i, item in enumerate(items):
        key, sub = jax.random.split(key)
        kwargs = {}
        if "ref" in item:
            # in-dataset reference features (ref == sty, same mel)
            kwargs["ref_feats"] = [(item["ref"], item["lf0"])]
        out = synth.tts(
            [item["raw_text"]],
            key=sub,
            temperature=float(cfg.get("test", {}).get("temperature", 1.5)),
            **kwargs,
        )[0]
        wav_path = os.path.join(out_dir, f"{i:03d}_syn.wav")
        write_wav(wav_path, out["wav"])
        if "y" in item:
            maes.append(mel_mae(item["y"], out["mel"]))
            mcds.append(mel_cepstral_distortion(item["y"], out["mel"]))
        gt_path = gt_wav_path(item.get("filepath", ""))
        if not (gt_path and os.path.isfile(gt_path)):
            gt_path = ""
        copy_src = gt_path or item.get("filepath", "")
        if copy_src and os.path.isfile(copy_src):
            base = os.path.join(
                out_dir, f"{i:03d}_ref" + os.path.splitext(copy_src)[1]
            )
            try:
                shutil.copy(copy_src, base)
            except OSError:
                pass
        hyp = asr.transcribe(out["wav"]) if asr.available else None
        if hyp is not None:
            wers.append(wer(item["raw_text"], hyp))
            cers.append(cer(item["raw_text"], hyp))
        # speaker cosine similarity vs the ground-truth utterance
        # (reference: DEX-TTS/src/metric.py:80-95, evaluation.py:76-85)
        if spk_scorer.available and gt_path:
            from dex_tts_tpu.audio.wav import read_wav, resample

            gt_wav, gt_sr = read_wav(gt_path)
            gt_wav = resample(gt_wav, gt_sr, 22050)
            cos = spk_scorer.cosine(out["wav"], gt_wav, sample_rate=22050)
            if cos is not None:
                coss.append(cos)

    report = {}
    for name, vals in [("mel_mae", maes), ("mcd", mcds), ("wer", wers),
                       ("cer", cers), ("cos", coss)]:
        if vals:
            mean, se = mean_and_stderr(vals)
            report[name] = (mean, se)
    lines = [
        f"{name}: {mean:.4f} ± {se:.4f}" for name, (mean, se) in report.items()
    ]
    text = "\n".join(lines) if lines else "no metrics available"
    print(text)
    with open(os.path.join(out_dir, "report.txt"), "w") as f:
        f.write(text + "\n")
    return report
