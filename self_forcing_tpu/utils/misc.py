"""Misc utilities (reference utils/misc.py: set_seed, merge_dict_list)."""
from __future__ import annotations

import random
from typing import Sequence

import numpy as np


def set_seed(seed: int):
    """Seed host RNGs; device randomness flows through explicit PRNG keys
    (the idiomatic-JAX replacement for torch.manual_seed,
    utils/misc.py:6-22)."""
    random.seed(seed)
    np.random.seed(seed)
    return seed


def merge_dict_list(dict_list: Sequence[dict]) -> dict:
    """Average scalars / stack arrays across step logs
    (utils/misc.py:25-39)."""
    if not dict_list:
        return {}
    out = {}
    for k in dict_list[0]:
        vals = [d[k] for d in dict_list if k in d]
        if isinstance(vals[0], (int, float)):
            out[k] = float(np.mean(vals))
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out
