"""Causal diffusion (teacher-forcing) finetuning objective
(reference model/diffusion.py).

Flow-matching loss on the causal model with per-block random timesteps;
optional teacher forcing over a [noise-augmented clean | noisy] doubled
sequence (model/diffusion.py:66-125), loss weighted by the scheduler's
Gaussian training weight (:115-119).

Fixes vs. reference (SURVEY.md §7): `_initialize_models` arity bug
(model/diffusion.py:34) is moot — params are explicit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.ops.masks import block_causal_mask, teacher_forcing_mask
from self_forcing_tpu.scheduler import FlowMatchScheduler
from self_forcing_tpu.training.objectives.base import (
    sample_timestep_per_block)


def generator_loss(gen_params, cfg: WanConfig, rope: RopeTables,
                   scheduler: FlowMatchScheduler, clean_latent: jax.Array,
                   context: jax.Array, num_frame_per_block: int,
                   rng: jax.Array, teacher_forcing: bool = True,
                   noise_augmentation_max_timestep: int = 0,
                   independent_first_frame: bool = False):
    """model/diffusion.py:52-125."""
    B, F, C, H, W = clean_latent.shape
    rng_t, rng_n, rng_aug = jax.random.split(rng, 3)
    num_train = scheduler.timesteps.shape[0]

    idx = sample_timestep_per_block(rng_t, 0, num_train, B, F,
                                    num_frame_per_block,
                                    independent_first_frame)
    t = scheduler.timesteps[idx]                     # [B, F] f32
    noise = jax.random.normal(rng_n, clean_latent.shape, clean_latent.dtype)
    flat = lambda a: a.reshape((B * F,) + a.shape[2:])
    noisy = scheduler.add_noise(flat(clean_latent), flat(noise),
                                t.reshape(-1)).reshape(clean_latent.shape)
    target = noise - clean_latent                    # flow target (v)

    clean_aug = clean_latent
    aug_t = None
    if noise_augmentation_max_timestep > 0:
        idx_aug = sample_timestep_per_block(
            rng_aug, 0, noise_augmentation_max_timestep, B, F,
            num_frame_per_block, independent_first_frame)
        aug_t = scheduler.timesteps[idx_aug]
        clean_aug = scheduler.add_noise(
            flat(clean_latent), flat(noise),
            aug_t.reshape(-1)).reshape(clean_latent.shape)

    fs = (H // cfg.patch_size[1]) * (W // cfg.patch_size[2])
    if teacher_forcing:
        mask = teacher_forcing_mask(F, fs, num_frame_per_block)
        flow = dit.forward_train(gen_params, cfg, noisy, t, context, mask,
                                 rope, clean_x=clean_aug, aug_t=aug_t)
    else:
        mask = block_causal_mask(F, fs, num_frame_per_block,
                                 cfg.local_attn_size)
        flow = dit.forward_train(gen_params, cfg, noisy, t, context, mask,
                                 rope)

    per_frame = jnp.mean(
        (flow.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
        axis=(2, 3, 4))                              # [B, F]
    w = scheduler.training_weight(t.reshape(-1)).reshape(B, F)
    loss = jnp.mean(per_frame * w)

    x0_pred = scheduler.convert_flow_pred_to_x0(
        flat(flow), flat(noisy), t.reshape(-1)).reshape(clean_latent.shape)
    return loss, {"timestep_mean": jnp.mean(t),
                  "x0_pred_mse": jnp.mean(
                      (x0_pred.astype(jnp.float32)
                       - clean_latent.astype(jnp.float32)) ** 2)}
