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


def v_pred_loss(*, x, x_pred, alphas_cumprod=None, timestep=None,
                weight=None, **_):
    """VPredLoss (utils/loss.py:38-48): 1/(1-acp[t])-weighted x0 MSE.
    Needs a DDPM-style schedule; FlowMatchScheduler has no alphas_cumprod
    (the reference sets it to None and would crash identically)."""
    if alphas_cumprod is None:
        raise ValueError("denoising_loss_type='v' needs a scheduler with "
                         "alphas_cumprod (DDPM-style); flow matching has "
                         "none — use 'flow', 'x0' or 'noise'")
    w = 1.0 / (1.0 - alphas_cumprod[timestep.astype(jnp.int32)])
    d = (x.astype(jnp.float32) - x_pred.astype(jnp.float32)) ** 2
    w = w.reshape(w.shape + (1,) * (d.ndim - w.ndim))
    if weight is not None:
        w = w * weight.reshape((-1,) + (1,) * (d.ndim - 1))
    return jnp.mean(w * d)


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
