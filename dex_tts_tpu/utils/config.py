"""YAML config system with attribute access.

Equivalent capability to the reference's DotDict/Config loader
(reference: DEX-TTS/src/utils.py:115-194) and experiment-dir setup
(reference: DEX-TTS/src/utils.py:15-46), re-designed: recursive dot-access
dicts, deep merge of CLI overrides, and deterministic experiment naming.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Mapping

import yaml


class DotDict(dict):
    """A dict whose items are also attributes, recursively."""

    def __init__(self, data: Mapping[str, Any] | None = None, **kwargs):
        super().__init__()
        data = dict(data or {})
        data.update(kwargs)
        for key, value in data.items():
            self[key] = self._wrap(value)

    @classmethod
    def _wrap(cls, value):
        if isinstance(value, Mapping) and not isinstance(value, DotDict):
            return cls(value)
        if isinstance(value, (list, tuple)):
            return type(value)(cls._wrap(v) for v in value)
        return value

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as exc:  # pragma: no cover - attribute protocol
            raise AttributeError(name) from exc

    def __setattr__(self, name, value):
        self[name] = self._wrap(value)

    def __setitem__(self, name, value):
        super().__setitem__(name, self._wrap(value))

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as exc:  # pragma: no cover
            raise AttributeError(name) from exc

    def __deepcopy__(self, memo):
        return DotDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def deep_update(self, other: Mapping[str, Any]) -> "DotDict":
        """Recursively merge ``other`` into self (other wins)."""
        for key, value in other.items():
            if (
                key in self
                and isinstance(self[key], DotDict)
                and isinstance(value, Mapping)
            ):
                self[key].deep_update(value)
            else:
                self[key] = value
        return self

    def to_dict(self) -> dict:
        out = {}
        for key, value in self.items():
            if isinstance(value, DotDict):
                out[key] = value.to_dict()
            elif isinstance(value, (list, tuple)):
                out[key] = [v.to_dict() if isinstance(v, DotDict) else v for v in value]
            else:
                out[key] = value
        return out


class Config(DotDict):
    """DotDict loaded from a YAML file path or a plain mapping."""

    def __init__(self, source: str | Mapping[str, Any] | None = None, **kwargs):
        if isinstance(source, str):
            with open(source, "r") as f:
                data = yaml.safe_load(f) or {}
        else:
            data = dict(source or {})
        data.update(kwargs)
        super().__init__(data)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)


def load_config(path: str, overrides: Mapping[str, Any] | None = None) -> Config:
    cfg = Config(path)
    if overrides:
        cfg.deep_update(overrides)
    return cfg


def set_experiment(cfg: Config, tag: str | None = None) -> Config:
    """Create experiment directories under ``cfg.checkpoint``.

    Equivalent to reference: DEX-TTS/src/utils.py:15-46 — auto-numbered
    experiment dirs with sample/image/result/eval subdirs — but the name is
    ``{dataset}-{N}`` (optionally ``-{tag}``) instead of the cwd name.
    """
    root = cfg.get("checkpoint", "./checkpoints")
    os.makedirs(root, exist_ok=True)
    base = str(cfg.get("dataset", "exp"))
    n = len([d for d in os.listdir(root) if d.startswith(base)])
    name = f"{base}-{n}" + (f"-{tag}" if tag else "")
    exp_dir = os.path.join(root, name)
    cfg.exp_dir = exp_dir
    for sub in ("sample", "image", "result", "eval", "ckpt"):
        os.makedirs(os.path.join(exp_dir, sub), exist_ok=True)
    cfg.dump(os.path.join(exp_dir, "base.yaml"))
    return cfg
