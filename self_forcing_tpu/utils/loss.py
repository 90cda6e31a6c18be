"""Denoising loss family + registry (reference utils/loss.py:1-81).

Each loss takes the rollout sample x, the critic's prediction, the noise,
and timesteps, and returns a scalar.  The flow variant is the production
one (denoising_loss_type: flow, configs/self_forcing_dmd.yaml)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _mse(a, b, weight=None):
    d = (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2
    if weight is not None:
        d = d * weight.reshape((-1,) + (1,) * (d.ndim - 1))
    return jnp.mean(d)


def x0_pred_loss(*, x, x_pred, weight=None, **_):
    return _mse(x, x_pred, weight)


def noise_pred_loss(*, noise, noise_pred, weight=None, **_):
    return _mse(noise, noise_pred, weight)


def v_pred_loss(*, v, v_pred, weight=None, **_):
    return _mse(v, v_pred, weight)


def flow_pred_loss(*, x, noise, flow_pred, weight=None, **_):
    """Flow matching: target v = noise - x0 (utils/loss.py FlowPredLoss)."""
    return _mse(noise - x, flow_pred, weight)


DENOISING_LOSSES = {
    "x0": x0_pred_loss,
    "noise": noise_pred_loss,
    "v": v_pred_loss,
    "flow": flow_pred_loss,
}


def get_denoising_loss(name: str):
    return DENOISING_LOSSES[name]
