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
    keys = {k: None for d in dict_list for k in d}  # ordered union
    for k in keys:
        vals = [d[k] for d in dict_list if k in d]
        first = np.asarray(vals[0]) if not isinstance(
            vals[0], (int, float)) else vals[0]
        if isinstance(vals[0], (int, float)) or                 getattr(first, "size", 2) == 1:
            # numbers AND 0-d/size-1 arrays (np.float32 is not a python
            # float) average; only true arrays stack
            out[k] = float(np.mean([np.asarray(v) for v in vals]))
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out
