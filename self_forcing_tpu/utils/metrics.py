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
                wandb.init(**(wandb_kwargs or {}))
                self._wandb = wandb
            except Exception:  # noqa: BLE001 — importable-but-unconfigured
                # wandb (no API key, offline) raises UsageError/CommError;
                # fall back to the JSONL sink either way
                self._wandb = None

    def log_video(self, name: str, video, step: int, fps: int = 16):
        """Log a decoded video (the reference's wandb.Video triplets,
        trainer/ode.py:190-209). ``video``: [T, H, W, 3] float in [0, 1]
        or uint8. Always written as an mp4 under ``logdir/videos``; also
        sent to wandb when enabled."""
        if not self.is_main:
            return None
        import numpy as np
        from self_forcing_tpu.utils.video_io import save_video
        video = np.asarray(video)
        if video.dtype != np.uint8:
            video = (np.clip(video, 0.0, 1.0) * 255.0).astype(np.uint8)
        vdir = os.path.join(self.logdir, "videos")
        os.makedirs(vdir, exist_ok=True)
        path = os.path.join(vdir, f"{name}_{step:06d}.mp4")
        save_video(video, path, fps=fps)
        if self._wandb is not None:
            # wandb.Video wants [T, C, H, W]
            self._wandb.log(
                {name: self._wandb.Video(video.transpose(0, 3, 1, 2),
                                         caption=name, fps=fps,
                                         format="mp4")}, step=step)
        return path

    def log(self, metrics: Mapping, step: int | None = None):
        if not self.is_main:
            return
        def scal(v):
            # size-1 arrays float() fine; bigger arrays get their mean
            # (float() on size>1 ndarrays raises TypeError)
            size = getattr(v, "size", 1)
            if hasattr(v, "__float__") and size == 1:
                return float(v)
            if size != 1 and hasattr(v, "mean"):
                return float(v.mean())
            return v

        rec = {"ts": round(time.time(), 3),
               **{k: scal(v) for k, v in metrics.items()}}
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
