"""SiD — Score identity Distillation (reference model/sid.py).

Generator loss (model/sid.py:96-141):
    L = (s_real - s_fake) * ((s_real - x0) - alpha * (s_real - s_fake))
normalized by mean |x0 - s_real| (no-grad), nan_to_num, mean.

Unlike DMD, the score forwards are NOT detached — gradient flows pathwise
through both score models into the generator (the reference wraps nothing
in no_grad here).  The critic loss is identical to DMD's (model/sid.py:188+).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from self_forcing_tpu.training.objectives.base import (
    ModelBundle, ObjectiveConfig, cfg_combined_score, sample_timestep, _sg,
    score_x0)
from self_forcing_tpu.training.objectives.dmd import (_add_noise_bf,
                                                      _make_ctx, critic_loss)

__all__ = ["generator_loss", "critic_loss"]


def distribution_matching_loss(bundle: ModelBundle, obj: ObjectiveConfig,
                               fake_params, real_params, pred, context,
                               neg_context, rng, t_from, t_to,
                               gradient_mask=None, cond=None):
    B, F = pred.shape[:2]
    if cond and cond.get("y") is not None:
        # production callers pre-align via align_cond_window (see dmd.py)
        cond = dict(cond, y=cond["y"][:, :F])
    min_t = t_to if (obj.ts_schedule and t_to is not None) \
        else obj.min_score_timestep
    max_t = t_from if (obj.ts_schedule_max and t_from is not None) \
        else obj.num_train_timestep
    rng_t, rng_n = jax.random.split(rng)
    t = sample_timestep(rng_t, int(min_t), int(max_t), B, F,
                        obj.timestep_shift, obj.min_step, obj.max_step)
    noise = jax.random.normal(rng_n, pred.shape, pred.dtype)
    noisy = _add_noise_bf(bundle.scheduler, pred, noise, t)

    # differentiable score forwards (frozen params still get no update)
    from self_forcing_tpu.training.objectives.base import model_cond
    y_c, clip_c = model_cond(bundle.critic_cfg, cond)
    fake_x0 = score_x0(fake_params, bundle.critic_cfg, bundle.rope_c,
                       bundle.scheduler, noisy, t, context,
                       y=y_c, clip_fea=clip_c)
    real_x0 = cfg_combined_score(real_params, bundle.teacher_cfg,
                                 bundle.rope_t, bundle.scheduler, noisy, t,
                                 context, neg_context,
                                 obj.real_guidance_scale, cond=cond,
                                 sp_mesh=bundle.teacher_sp_mesh,
                                 sp_axis=bundle.teacher_sp_axis,
                                 sp_param_specs=(
                                     bundle.teacher_param_sp_specs))

    rf = real_x0.astype(jnp.float32)
    ff = fake_x0.astype(jnp.float32)
    pf = pred.astype(jnp.float32)
    sid = (rf - ff) * ((rf - pf) - obj.sid_alpha * (rf - ff))

    normalizer = _sg(jnp.mean(jnp.abs(pf - rf), axis=(1, 2, 3, 4),
                              keepdims=True))
    sid = jnp.nan_to_num(sid / normalizer)
    if gradient_mask is not None:
        loss = jnp.sum(sid * gradient_mask) / jnp.maximum(
            jnp.sum(gradient_mask), 1)
    else:
        loss = jnp.mean(sid)
    return loss, {"dmdtrain_gradient_norm": jnp.zeros(()),
                  "timestep_mean": jnp.mean(t)}


def generator_loss(bundle: ModelBundle, obj: ObjectiveConfig,
                   gen_params, fake_params, real_params, noise, context,
                   neg_context, exit_idx: int, rng: jax.Array,
                   gradient_mask=None, cond=None):
    rng_roll, rng_sid = jax.random.split(rng)
    ctx_kv_g = _make_ctx(gen_params, bundle.generator_cfg, context, cond)
    pred, roll_mask, t_from, t_to = bundle.run_generator(
        gen_params, noise, ctx_kv_g, exit_idx, rng_roll, cond=cond)
    if gradient_mask is None:
        gradient_mask = roll_mask  # long-rollout first-block mask
    from self_forcing_tpu.training.objectives.base import align_cond_window
    cond = align_cond_window(cond, noise.shape[1], pred.shape[1])
    return distribution_matching_loss(
        bundle, obj, fake_params, real_params, pred, context, neg_context,
        rng_sid, t_from, t_to, gradient_mask, cond)
