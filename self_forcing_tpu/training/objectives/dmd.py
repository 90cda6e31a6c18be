"""DMD — Distribution Matching Distillation (reference model/dmd.py).

Loss math, replicated exactly:
- KL gradient = normalized (fake_x0 - real_x0_cfg) on a re-noised rollout
  sample (model/dmd.py:54-126), applied through the MSE-to-detached-target
  trick: loss = ½‖x − sg(x − grad)‖² (:188-193).
- Critic: flow-matching denoising loss on no-grad rollout samples
  (:237-332).

The reference computes the final MSE in float64 (:189-193); TPUs do fp32 —
the loss value differs at ~1e-7 relative, the gradient direction is
identical.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from self_forcing_tpu.scheduler import FlowMatchScheduler
from self_forcing_tpu.training.objectives.base import (
    ModelBundle, ObjectiveConfig, cfg_combined_score, sample_timestep, _sg)
from self_forcing_tpu.utils.loss import get_denoising_loss


def _add_noise_bf(scheduler: FlowMatchScheduler, x, noise, t):
    B, F = x.shape[:2]
    flat = lambda a: a.reshape((B * F,) + a.shape[2:])
    return scheduler.add_noise(flat(x), flat(noise), t.reshape(-1)).reshape(x.shape)


def compute_kl_grad(bundle: ModelBundle, obj: ObjectiveConfig,
                    fake_params, real_params, noisy, pred, t,
                    context, neg_context, cond=None):
    """model/dmd.py:54-126.  All forwards are no-grad."""
    cond = _sg(cond) if cond else None
    fake_x0 = cfg_combined_score(
        _sg(fake_params), bundle.critic_cfg, bundle.rope_c, bundle.scheduler,
        _sg(noisy), t, _sg(context), _sg(neg_context),
        obj.fake_guidance_scale, cond=cond)
    real_x0 = cfg_combined_score(
        _sg(real_params), bundle.teacher_cfg, bundle.rope_t, bundle.scheduler,
        _sg(noisy), t, _sg(context), _sg(neg_context),
        obj.real_guidance_scale, cond=cond,
        sp_mesh=bundle.teacher_sp_mesh, sp_axis=bundle.teacher_sp_axis,
        sp_param_specs=bundle.teacher_param_sp_specs)

    grad = fake_x0 - real_x0
    # normalization (model/dmd.py:117-120)
    p_real = _sg(pred) - real_x0
    normalizer = jnp.mean(jnp.abs(p_real.astype(jnp.float32)),
                          axis=(1, 2, 3, 4), keepdims=True)
    grad = grad.astype(jnp.float32) / normalizer
    grad = jnp.nan_to_num(grad)
    return _sg(grad), {"dmdtrain_gradient_norm": jnp.mean(jnp.abs(grad))}


def distribution_matching_loss(bundle: ModelBundle, obj: ObjectiveConfig,
                               fake_params, real_params, pred, context,
                               neg_context, rng, t_from, t_to,
                               gradient_mask=None, cond=None):
    """model/dmd.py:128-194. ``pred`` carries generator gradient."""
    B, F = pred.shape[:2]
    if cond and cond.get("y") is not None:
        # production callers pre-align via align_cond_window (trailing
        # window for trimmed rollouts); this slice is a no-op then and
        # covers direct short-rollout callers
        cond = dict(cond, y=cond["y"][:, :F])
    min_t = t_to if (obj.ts_schedule and t_to is not None) \
        else obj.min_score_timestep
    max_t = t_from if (obj.ts_schedule_max and t_from is not None) \
        else obj.num_train_timestep
    rng_t, rng_n = jax.random.split(rng)
    t = sample_timestep(rng_t, int(min_t), int(max_t), B, F,
                        obj.timestep_shift, obj.min_step, obj.max_step)
    noise = jax.random.normal(rng_n, pred.shape, pred.dtype)
    noisy = _sg(_add_noise_bf(bundle.scheduler, _sg(pred), noise, t))

    grad, log = compute_kl_grad(bundle, obj, fake_params, real_params,
                                noisy, pred, t, context, neg_context, cond)
    target = _sg(pred.astype(jnp.float32) - grad)
    diff = (pred.astype(jnp.float32) - target) ** 2
    if gradient_mask is not None:
        loss = 0.5 * jnp.sum(diff * gradient_mask) / jnp.maximum(
            jnp.sum(gradient_mask), 1)
    else:
        loss = 0.5 * jnp.mean(diff)
    log["timestep_mean"] = jnp.mean(t)
    return loss, log


def generator_loss(bundle: ModelBundle, obj: ObjectiveConfig,
                   gen_params, fake_params, real_params,
                   noise, context, neg_context, exit_idx: int,
                   rng: jax.Array, gradient_mask=None, cond=None):
    """model/dmd.py:196-235: rollout + DMD loss.  ``cond``: optional
    conditioning dict {add_condition, y, clip_fea} threaded through the
    rollout and both score models (trainer/distillation.py:264-276)."""
    rng_roll, rng_dmd = jax.random.split(rng)
    ctx_kv_g = _make_ctx(gen_params, bundle.generator_cfg, context, cond)
    pred, roll_mask, t_from, t_to = bundle.run_generator(
        gen_params, noise, ctx_kv_g, exit_idx, rng_roll, cond=cond)
    if gradient_mask is None:
        gradient_mask = roll_mask  # long-rollout first-block mask
    from self_forcing_tpu.training.objectives.base import align_cond_window
    cond = align_cond_window(cond, noise.shape[1], pred.shape[1])
    loss, log = distribution_matching_loss(
        bundle, obj, fake_params, real_params, pred, context, neg_context,
        rng_dmd, t_from, t_to, gradient_mask, cond)
    return loss, log


def critic_loss(bundle: ModelBundle, obj: ObjectiveConfig,
                gen_params, fake_params, noise, context, neg_context,
                exit_idx: int, rng: jax.Array, cond=None):
    """model/dmd.py:237-332: no-grad rollout -> critic denoising loss."""
    rng_roll, rng_t, rng_n = jax.random.split(rng, 3)
    ctx_kv_g = _make_ctx(_sg(gen_params), bundle.generator_cfg, context,
                         cond)
    pred, _, t_from, t_to = bundle.run_generator(
        _sg(gen_params), noise, ctx_kv_g, exit_idx, rng_roll, cond=cond)
    pred = _sg(pred)

    B, F = pred.shape[:2]
    min_t = t_to if (obj.ts_schedule and t_to is not None) \
        else obj.min_score_timestep
    max_t = t_from if (obj.ts_schedule_max and t_from is not None) \
        else obj.num_train_timestep
    t = sample_timestep(rng_t, int(min_t), int(max_t), B, F,
                        obj.timestep_shift, obj.min_step, obj.max_step)
    critic_noise = jax.random.normal(rng_n, pred.shape, pred.dtype)
    noisy = _add_noise_bf(bundle.scheduler, pred, critic_noise, t)

    from self_forcing_tpu.training.objectives.base import (
        align_cond_window, model_cond, score_x0)
    cond = align_cond_window(cond, noise.shape[1], F)
    y_c, clip_c = model_cond(bundle.critic_cfg, cond)
    pred_fake = score_x0(fake_params, bundle.critic_cfg, bundle.rope_c,
                         bundle.scheduler, noisy, t, context,
                         y=y_c, clip_fea=clip_c)

    flat = lambda a: a.reshape((B * F,) + a.shape[2:])
    loss_fn = get_denoising_loss(obj.denoising_loss_type)
    if obj.denoising_loss_type == "flow":
        flow_pred = bundle.scheduler.convert_x0_to_flow_pred(
            flat(pred_fake), flat(noisy), t.reshape(-1))
        loss = loss_fn(x=flat(pred), noise=flat(critic_noise),
                       flow_pred=flow_pred)
    else:
        noise_pred = bundle.scheduler.convert_x0_to_noise(
            flat(pred_fake), flat(noisy), t.reshape(-1))
        loss = loss_fn(x=flat(pred), x_pred=flat(pred_fake),
                       noise=flat(critic_noise), noise_pred=noise_pred,
                       alphas_cumprod=getattr(bundle.scheduler,
                                              "alphas_cumprod", None),
                       timestep=t.reshape(-1))
    return loss, {"critic_timestep_mean": jnp.mean(t)}


def _make_ctx(gen_params, cfg, context, cond=None):
    from self_forcing_tpu.models.wan import dit
    clip_fea = (cond or {}).get("clip_fea") \
        if cfg.model_type == "i2v" else None
    return dit.precompute_context(gen_params, cfg, context, clip_fea)
