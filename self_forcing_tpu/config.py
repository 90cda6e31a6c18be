"""YAML config system with recursive merge and attribute access.

Plays the role of OmegaConf in the reference (train.py:20-22,
inference.py:57-59, demo.py:44-46): a default YAML is merged under the
experiment YAML, and the result is accessed with attribute syntax plus
``getattr(config, key, default)`` at use sites.  We keep exactly those
semantics (same YAML keys — see SURVEY.md §5.6) on top of PyYAML, with a
typed-dict core that is pickleable and hashable-free (safe to close over
in jitted functions only via static extraction).
"""
from __future__ import annotations

import os

import copy
from typing import Any, Mapping

import yaml


class Config(dict):
    """dict with attribute access and recursive wrapping.

    ``cfg.key`` ≡ ``cfg["key"]``; missing attribute raises AttributeError so
    that ``getattr(cfg, k, default)`` behaves like the reference's OmegaConf
    usage.
    """

    def __init__(self, data: Mapping[str, Any] | None = None, **kw: Any):
        super().__init__()
        merged: dict = dict(data or {})
        merged.update(kw)
        for k, v in merged.items():
            self[k] = _wrap(v)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        return {k: (v.to_dict() if isinstance(v, Config) else v) for k, v in self.items()}


def _wrap(value: Any) -> Any:
    if isinstance(value, Config):
        return value
    if isinstance(value, Mapping):
        return Config(value)
    if isinstance(value, (list, tuple)):
        return type(value)(_wrap(v) for v in value)
    return value


def merge(base: Mapping[str, Any], override: Mapping[str, Any]) -> Config:
    """Recursive merge: ``override`` wins, dicts merge key-wise.

    Matches OmegaConf.merge(default_config, config) in the reference
    (train.py:20-22).
    """
    out = Config(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = merge(out[k], v)
        else:
            out[k] = _wrap(v)
    return out


def load_yaml(path: str) -> Config:
    with open(path) as f:
        return Config(yaml.safe_load(f) or {})


def load_config(config_path: str, default_path: str | None = None) -> Config:
    """Load an experiment config, merged over the default config.

    Reference: ``OmegaConf.merge(default_config, config)`` (train.py:20-22).
    """
    cfg = load_yaml(config_path)
    if default_path is not None and os.path.exists(default_path):
        # optional like the reference's fixed configs/default_config.yaml
        # merge — an experiment config outside configs/ must still load
        cfg = merge(load_yaml(default_path), cfg)
    return cfg
