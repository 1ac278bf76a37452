"""Experiment metric logging.

Capability equivalent of the reference's plaintext log.txt + optional
Neptune hook (reference: DEX-TTS/src/utils.py:48-55, src/train.py:101-103):
a JSON-lines metrics file that any dashboard can tail, plus an optional
external backend (neptune/wandb) used only if importable and configured.
"""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, exp_dir: str, backend: str | None = None, **backend_kwargs):
        self.path = os.path.join(exp_dir, "metrics.jsonl")
        os.makedirs(exp_dir, exist_ok=True)
        self._run = None
        if backend == "neptune":  # pragma: no cover - optional dependency
            try:
                import neptune

                self._run = neptune.init_run(**backend_kwargs)
            except Exception:
                self._run = None
        elif backend == "wandb":  # pragma: no cover - optional dependency
            try:
                import wandb

                self._run = wandb.init(**backend_kwargs)
            except Exception:
                self._run = None

    def log(self, step: int, metrics: dict, prefix: str = "") -> None:
        record = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            record[f"{prefix}{k}"] = float(v)
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._run is not None:  # pragma: no cover
            try:
                for k, v in record.items():
                    if k not in ("step", "time"):
                        self._run[k].append(v, step=step)
            except Exception:
                pass

    def close(self) -> None:  # pragma: no cover
        if self._run is not None:
            try:
                self._run.stop()
            except Exception:
                pass
