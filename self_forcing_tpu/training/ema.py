"""EMA over (sharded) parameter pytrees.

Reference EMA_FSDP keeps a CPU fp32 shadow updated under
summon_full_params (utils/distributed.py:91-125); with pjit-sharded params
the shadow is just another pytree with the same shardings — no gathers."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_ema(params):
    return jax.tree.map(lambda x: x.astype(jnp.float32), params)


@jax.jit
def _update_ema(ema, params, decay):
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(jnp.float32),
        ema, params)


def update_ema(ema, params, decay: float):
    """Jitted once at module level: re-wrapping jax.jit per call (as the
    trainers used to) retraced the full-tree update every train step."""
    return _update_ema(ema, params, jnp.float32(decay))


def ema_to_params(ema, like):
    return jax.tree.map(lambda e, p: e.astype(p.dtype), ema, like)
