"""Metrics logging (reference wandb usage, trainer/distillation.py:48-57,
387-422).  wandb is not in this image: the default sink is a JSONL file +
stdout; if wandb is importable and configured it is used transparently."""
from __future__ import annotations

import json
import os
import time
from typing import Mapping


class MetricsLogger:
    def __init__(self, logdir: str, disable_wandb: bool = True,
                 wandb_kwargs: Mapping | None = None, is_main: bool = True):
        self.is_main = is_main
        self.logdir = logdir
        self._file = None
        self._wandb = None
        if not is_main:
            return
        os.makedirs(logdir, exist_ok=True)
        self._file = open(os.path.join(logdir, "metrics.jsonl"), "a",
                          buffering=1)
        if not disable_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                pass

    def log(self, metrics: Mapping, step: int | None = None):
        if not self.is_main:
            return
        rec = {"ts": round(time.time(), 3), **{
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in metrics.items()}}
        if step is not None:
            rec["step"] = step
        self._file.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)

    def close(self):
        if self._file:
            self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
