"""CausVid baseline objective (reference model/causvid.py).

Backward simulation without a rollout: noise *clean teacher latents* at
every timestep of the denoising list, pick one per block at random, run the
generator once (optionally with teacher forcing), then apply the DMD loss
(model/causvid.py:184-260).  The critic trains with the same denoising loss
as DMD on the generator's one-step predictions.

Fixes vs. reference (SURVEY.md §7): the reference calls
``self.denoising_loss_func`` which BaseModel never defines
(model/causvid.py:374) — here the loss comes from the shared registry.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.training.objectives.base import (
    ModelBundle, ObjectiveConfig, sample_timestep_per_block, score_x0, _sg)
from self_forcing_tpu.training.objectives.dmd import (
    _add_noise_bf, distribution_matching_loss)
from self_forcing_tpu.utils.loss import get_denoising_loss


def _run_generator(bundle: ModelBundle, obj: ObjectiveConfig, gen_params,
                   clean_latent, context, rng, step_list,
                   teacher_forcing: bool):
    """model/causvid.py:184-260: per-block random list index -> noisy input
    at that list timestep -> one generator forward (no KV cache)."""
    B, F = clean_latent.shape[:2]
    rng_i, rng_n = jax.random.split(rng)
    steps = jnp.asarray(step_list, jnp.float32)       # [T]
    idx = sample_timestep_per_block(
        rng_i, 0, len(step_list), B, F, obj.num_frame_per_block)
    t = steps[idx]                                    # [B, F]
    noise = jax.random.normal(rng_n, clean_latent.shape, clean_latent.dtype)
    noisy = _add_noise_bf(bundle.scheduler, clean_latent, noise, t)
    noisy = jnp.where((t == 0.0)[..., None, None, None], clean_latent, noisy)

    from self_forcing_tpu.ops.masks import block_causal_mask
    cfg = bundle.generator_cfg
    fs = (clean_latent.shape[3] // cfg.patch_size[1]) * (
        clean_latent.shape[4] // cfg.patch_size[2])
    if teacher_forcing:
        from self_forcing_tpu.ops.masks import teacher_forcing_mask
        mask = teacher_forcing_mask(F, fs, obj.num_frame_per_block)
        flow = dit.forward_train(gen_params, cfg, noisy, t, context, mask,
                                 bundle.rope_g, clean_x=clean_latent)
    else:
        mask = block_causal_mask(F, fs, obj.num_frame_per_block,
                                 cfg.local_attn_size)
        flow = dit.forward_train(gen_params, cfg, noisy, t, context, mask,
                                 bundle.rope_g)
    flat = lambda a: a.reshape((B * F,) + a.shape[2:])
    pred = bundle.scheduler.convert_flow_pred_to_x0(
        flat(flow), flat(noisy), t.reshape(-1)).reshape(clean_latent.shape)
    return pred


def generator_loss(bundle: ModelBundle, obj: ObjectiveConfig,
                   gen_params, fake_params, real_params,
                   clean_latent, context, neg_context, rng: jax.Array,
                   teacher_forcing: bool = False):
    """model/causvid.py:262-330: one-step prediction + DMD loss."""
    step_list = bundle.pipeline.denoising_step_list
    rng_gen, rng_dmd = jax.random.split(rng)
    pred = _run_generator(bundle, obj, gen_params, clean_latent, context,
                          rng_gen, step_list, teacher_forcing)
    loss, log = distribution_matching_loss(
        bundle, obj, fake_params, real_params, pred, context, neg_context,
        rng_dmd, None, None)
    return loss, log


def critic_loss(bundle: ModelBundle, obj: ObjectiveConfig,
                gen_params, fake_params, clean_latent, context,
                neg_context, rng: jax.Array, teacher_forcing: bool = False):
    """model/causvid.py:332-391: critic denoising loss on no-grad one-step
    generator outputs."""
    del neg_context
    step_list = bundle.pipeline.denoising_step_list
    rng_gen, rng_t, rng_n = jax.random.split(rng, 3)
    pred = _sg(_run_generator(bundle, obj, _sg(gen_params), clean_latent,
                              context, rng_gen, step_list, teacher_forcing))
    B, F = pred.shape[:2]
    from self_forcing_tpu.training.objectives.base import sample_timestep
    t = sample_timestep(rng_t, obj.min_score_timestep,
                        obj.num_train_timestep, B, F, obj.timestep_shift,
                        obj.min_step, obj.max_step)
    critic_noise = jax.random.normal(rng_n, pred.shape, pred.dtype)
    noisy = _add_noise_bf(bundle.scheduler, pred, critic_noise, t)
    pred_fake = score_x0(fake_params, bundle.critic_cfg, bundle.rope_c,
                         bundle.scheduler, noisy, t, context)
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
