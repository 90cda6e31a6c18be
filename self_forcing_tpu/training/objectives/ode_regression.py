"""ODE-regression init objective (reference model/ode_regression.py).

Regress the causal generator onto precomputed ODE-solver trajectories:
pick a random intermediate latent per block, predict x0, MSE against the
trajectory's final latent with a timestep!=0 mask (:57-129).

Fixes vs. reference (SURVEY.md §7): `_initialize_models` arity mismatch
(model/ode_regression.py:46) is moot here — params come in explicitly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.ops.masks import block_causal_mask
from self_forcing_tpu.scheduler import FlowMatchScheduler
from self_forcing_tpu.training.objectives.base import (
    sample_timestep_per_block)


def prepare_generator_input(rng: jax.Array, ode_latent: jax.Array,
                            step_list, num_frame_per_block: int,
                            i2v: bool = False):
    """ode_latent [B, T_steps, F, C, H, W] -> (noisy_input, timestep)
    (model/ode_regression.py:57-100)."""
    B, T, F = ode_latent.shape[:3]
    idx = sample_timestep_per_block(rng, 0, T, B, F, num_frame_per_block)
    if i2v:
        idx = idx.at[:, 0].set(T - 1)
    steps = jnp.asarray(step_list, jnp.float32)
    t = steps[idx]
    # gather picks ode_latent[b, idx[b, f], f] per frame:
    b_ids = jnp.arange(B)[:, None]
    f_ids = jnp.arange(F)[None, :]
    noisy = ode_latent[b_ids, idx, f_ids]
    return noisy, t


def generator_loss(gen_params, cfg: WanConfig, rope: RopeTables,
                   scheduler: FlowMatchScheduler, ode_latent: jax.Array,
                   context: jax.Array, step_list,
                   num_frame_per_block: int, rng: jax.Array,
                   i2v: bool = False):
    """model/ode_regression.py:102-138."""
    B, T, F, C, H, W = ode_latent.shape
    target = ode_latent[:, -1]
    noisy, t = prepare_generator_input(rng, ode_latent, step_list,
                                       num_frame_per_block, i2v)
    fs = (H // cfg.patch_size[1]) * (W // cfg.patch_size[2])
    mask = block_causal_mask(F, fs, num_frame_per_block,
                             cfg.local_attn_size)
    flow = dit.forward_train(gen_params, cfg, noisy, t, context, mask, rope)
    flat = lambda a: a.reshape((B * F,) + a.shape[2:])
    pred = scheduler.convert_flow_pred_to_x0(
        flat(flow), flat(noisy), t.reshape(-1)).reshape(noisy.shape)

    m = (t != 0.0).astype(jnp.float32)[..., None, None, None]
    diff = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    loss = jnp.sum(diff * m) / jnp.maximum(jnp.sum(
        m * jnp.ones_like(diff)), 1.0)
    log = {
        "unnormalized_loss": jnp.mean(diff, axis=(1, 2, 3, 4)),
        "timestep": jnp.mean(t, axis=1),
        # latent triplet for periodic video visualization (the reference
        # keeps these in log_dict too, trainer/ode.py:190-209); they stay
        # device arrays until a visualization step actually fetches them
        "input": noisy,
        "output": pred,
    }
    return loss, log
