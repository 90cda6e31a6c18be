"""GAN distillation objective (reference model/gan.py).

Discriminator = the fake_score (critic) backbone with the cls branch of
dit.forward_classify.  Losses replicate the reference exactly:
- generator: softplus(-D(fake)) (or relativistic softplus(-(D(f)-D(r)))),
  scaled by gan_g_weight (model/gan.py:166-171).
- critic:    softplus(-D(real)) + softplus(D(fake)) (or relativistic),
  scaled by gan_d_weight (:250-255), plus R1/R2 finite-difference
  gradient penalties around real/fake samples (:258-287 — with the
  reference's `zeros_like(r2_loss)`-before-assignment bug fixed, see
  SURVEY.md §7 bug list).

Fake and real samples go through the discriminator in one batched call
(the reference concatenates along batch, :153-160) at a shared uniform
critic timestep.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.training.objectives.base import (
    ModelBundle, ObjectiveConfig, sample_timestep, _sg)
from self_forcing_tpu.training.objectives.dmd import _add_noise_bf, _make_ctx


def _discriminate(bundle: ModelBundle, fake_params, cls_params, noisy, t,
                  context, concat_time_embeddings: bool) -> jax.Array:
    _, logits = dit.forward_classify(
        fake_params, cls_params, bundle.critic_cfg, noisy, t, context,
        bundle.rope_c, concat_time_embeddings=concat_time_embeddings)
    return logits


def _critic_t(obj: ObjectiveConfig, rng, B, F, t_from, t_to,
              critic_shift: float):
    min_t = t_to if (obj.ts_schedule and t_to is not None) \
        else obj.min_score_timestep
    max_t = t_from if (obj.ts_schedule_max and t_from is not None) \
        else obj.num_train_timestep
    return sample_timestep(rng, int(min_t), int(max_t), B, F,
                           critic_shift, obj.min_step, obj.max_step)


def generator_loss(bundle: ModelBundle, obj: ObjectiveConfig,
                   gen_params, fake_params, cls_params,
                   noise, clean_latent, context, neg_context,
                   exit_idx: int, rng: jax.Array,
                   gan_g_weight: float = 1e-2,
                   relativistic: bool = False,
                   concat_time_embeddings: bool = False,
                   critic_shift: float | None = None):
    """model/gan.py:89-172: rollout -> D(fake) softplus loss."""
    del neg_context
    rng_roll, rng_t, rng_n = jax.random.split(rng, 3)
    ctx_kv = _make_ctx(gen_params, bundle.generator_cfg, context)
    pred, _, t_from, t_to = bundle.run_generator(gen_params, noise, ctx_kv,
                                              exit_idx, rng_roll)
    B, F = pred.shape[:2]
    t = _critic_t(obj, rng_t, B, F, t_from, t_to,
                  critic_shift or obj.timestep_shift)
    critic_noise = jax.random.normal(rng_n, pred.shape, pred.dtype)
    noisy_fake = _add_noise_bf(bundle.scheduler, pred, critic_noise, t)
    noisy_real = _add_noise_bf(bundle.scheduler, _sg(clean_latent),
                               jax.random.normal(
                                   jax.random.fold_in(rng_n, 1),
                                   clean_latent.shape, clean_latent.dtype), t)

    # batched fake|real pass, discriminator frozen for the generator step
    noisy = jnp.concatenate([noisy_fake, noisy_real], axis=0)
    logits = _discriminate(bundle, _sg(fake_params), _sg(cls_params), noisy,
                           jnp.concatenate([t, t], axis=0),
                           jnp.concatenate([context, context], axis=0),
                           concat_time_embeddings)
    fake_logit, real_logit = jnp.split(logits, 2, axis=0)
    if relativistic:
        g_loss = jnp.mean(jax.nn.softplus(
            -(fake_logit - real_logit).astype(jnp.float32)))
    else:
        g_loss = jnp.mean(jax.nn.softplus(-fake_logit.astype(jnp.float32)))
    g_loss = g_loss * gan_g_weight
    return g_loss, {"gan_g_loss": g_loss,
                    "fake_logit_mean": jnp.mean(fake_logit)}


def critic_loss(bundle: ModelBundle, obj: ObjectiveConfig,
                gen_params, fake_params, cls_params,
                noise, real_latent, context, neg_context,
                exit_idx: int, rng: jax.Array,
                gan_d_weight: float = 1e-2,
                relativistic: bool = False,
                concat_time_embeddings: bool = False,
                r1_weight: float = 0.0, r2_weight: float = 0.0,
                r1_sigma: float = 0.01, r2_sigma: float = 0.01,
                critic_shift: float | None = None):
    """model/gan.py:175-295: D loss on (no-grad rollout, real data) pairs +
    R1/R2 finite-difference penalties."""
    del neg_context
    rng_roll, rng_t, rng_n, rng_r = jax.random.split(rng, 4)
    ctx_kv = _make_ctx(_sg(gen_params), bundle.generator_cfg, context)
    pred, _, t_from, t_to = bundle.run_generator(
        _sg(gen_params), noise, ctx_kv, exit_idx, rng_roll)
    pred = _sg(pred)

    B, F = pred.shape[:2]
    t = _critic_t(obj, rng_t, B, F, t_from, t_to,
                  critic_shift or obj.timestep_shift)
    critic_noise = jax.random.normal(rng_n, pred.shape, pred.dtype)
    noisy_fake = _add_noise_bf(bundle.scheduler, pred, critic_noise, t)
    noisy_real = _add_noise_bf(bundle.scheduler, real_latent, critic_noise, t)

    noisy = jnp.concatenate([noisy_fake, noisy_real], axis=0)
    logits = _discriminate(bundle, fake_params, cls_params, noisy,
                           jnp.concatenate([t, t], axis=0),
                           jnp.concatenate([context, context], axis=0),
                           concat_time_embeddings)
    fake_logit, real_logit = jnp.split(logits, 2, axis=0)

    if relativistic:
        d_loss = jnp.mean(jax.nn.softplus(
            -(real_logit - fake_logit).astype(jnp.float32)))
    else:
        d_loss = (jnp.mean(jax.nn.softplus(-real_logit.astype(jnp.float32)))
                  + jnp.mean(jax.nn.softplus(fake_logit.astype(jnp.float32))))
    d_loss = d_loss * gan_d_weight

    r1_loss = jnp.zeros((), jnp.float32)
    r2_loss = jnp.zeros((), jnp.float32)
    if r1_weight > 0:
        eps = r1_sigma * jax.random.normal(rng_r, noisy_real.shape,
                                           noisy_real.dtype)
        logit_p = _discriminate(bundle, fake_params, cls_params,
                                noisy_real + eps, t, context,
                                concat_time_embeddings)
        r1_grad = (logit_p - real_logit) / r1_sigma
        r1_loss = r1_weight * jnp.mean(r1_grad.astype(jnp.float32) ** 2)
    if r2_weight > 0:
        eps = r2_sigma * jax.random.normal(jax.random.fold_in(rng_r, 1),
                                           noisy_fake.shape, noisy_fake.dtype)
        logit_p = _discriminate(bundle, fake_params, cls_params,
                                noisy_fake + eps, t, context,
                                concat_time_embeddings)
        r2_grad = (logit_p - fake_logit) / r2_sigma
        r2_loss = r2_weight * jnp.mean(r2_grad.astype(jnp.float32) ** 2)

    total = d_loss + r1_loss + r2_loss
    return total, {"gan_d_loss": d_loss, "r1_loss": r1_loss,
                   "r2_loss": r2_loss,
                   "noisy_real_logit": jnp.mean(real_logit),
                   "noisy_fake_logit": jnp.mean(fake_logit)}
