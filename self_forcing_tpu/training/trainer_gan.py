"""GAN trainer (reference trainer/gan.py — repaired).

The reference file is broken as committed (undefined checkpointers,
trainer/gan.py:187-190); this re-design keeps its working behavior:
alternating generator/critic updates, a discriminator warmup phase where
only the critic trains (:39-43), a separate learning-rate multiplier for
the cls-branch parameter group (:105-120 — realized here as a second optax
optimizer over the cls params), R1/R2 penalties, EMA, and checkpointing
with the {generator, critic, generator_ema} layout.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import optax

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.training import ema as ema_lib
from self_forcing_tpu.training.objectives import gan as gan_obj
from self_forcing_tpu.training.objectives.base import (ModelBundle,
                                                       ObjectiveConfig)
from self_forcing_tpu.training.optim import make_optimizer


class GANTrainer:
    def __init__(self, config, generator_params, fake_params,
                 generator_cfg: WanConfig, critic_cfg: WanConfig,
                 cls_params=None, mesh=None):
        self.config = config
        # params arrive pre-sharded from train.py's setup_mesh; jit
        # propagates their shardings (GSPMD), so the mesh is only kept
        # for introspection/batch placement parity with the other
        # trainers (reference trainer/gan.py FSDP-wraps the same way)
        self.mesh = mesh
        obj = ObjectiveConfig(
            num_train_timestep=int(getattr(config, "num_train_timestep", 1000)),
            timestep_shift=float(getattr(config, "timestep_shift", 1.0)),
            ts_schedule=bool(getattr(config, "ts_schedule", True)),
            ts_schedule_max=bool(getattr(config, "ts_schedule_max", False)),
            min_score_timestep=int(getattr(config, "min_score_timestep", 0)),
            num_frame_per_block=int(getattr(config, "num_frame_per_block", 1)),
            same_step_across_blocks=bool(
                getattr(config, "same_step_across_blocks", True)),
            num_training_frames=int(getattr(config, "num_training_frames", 21)),
            context_noise=float(getattr(config, "context_noise", 0)),
        )
        self.obj = obj
        gen_cfg = dataclasses.replace(
            generator_cfg, num_frame_per_block=obj.num_frame_per_block,
            independent_first_frame=bool(
                getattr(config, "independent_first_frame", False)))
        self.bundle = ModelBundle.create(
            gen_cfg, critic_cfg, critic_cfg, obj,
            [int(s) for s in config.denoising_step_list])
        if getattr(config, "warp_denoising_step", False):
            # warp through scheduler timesteps like every other trainer
            # (reference model/base.py:20-22 applies it to ALL models)
            from self_forcing_tpu.scheduler import warp_denoising_steps
            warped = warp_denoising_steps(
                self.bundle.scheduler,
                [int(s) for s in config.denoising_step_list])
            self.bundle.pipeline.denoising_step_list = tuple(
                float(s) for s in warped if s != 0)

        if cls_params is None:
            cls_params = dit.init_cls_branch_params(
                jax.random.PRNGKey(int(getattr(config, "seed", 0)) + 7),
                critic_cfg,
                num_class=int(getattr(config, "num_class", 1)),
                time_embed_dim=(critic_cfg.dim if getattr(
                    config, "concat_time_embeddings", False) else 0))

        self.gen_optimizer = make_optimizer(
            lr=float(config.lr),
            beta1=float(getattr(config, "beta1", 0.0)),
            beta2=float(getattr(config, "beta2", 0.999)),
            weight_decay=float(getattr(config, "weight_decay", 0.01)),
            max_grad_norm=float(getattr(config, "max_grad_norm_generator", 10.0)))
        lr_mult = float(getattr(config, "discriminator_lr_multiplier", 1.0))
        self.critic_optimizer = make_optimizer(
            lr=float(getattr(config, "lr_critic", config.lr)),
            beta1=float(getattr(config, "beta1_critic", 0.0)),
            beta2=float(getattr(config, "beta2_critic", 0.999)),
            weight_decay=float(getattr(config, "weight_decay", 0.01)),
            max_grad_norm=float(getattr(config, "max_grad_norm_critic", 10.0)))
        self.cls_optimizer = make_optimizer(
            lr=float(getattr(config, "lr_critic", config.lr)) * lr_mult,
            beta1=float(getattr(config, "beta1_critic", 0.0)),
            beta2=float(getattr(config, "beta2_critic", 0.999)),
            weight_decay=float(getattr(config, "weight_decay", 0.01)),
            max_grad_norm=float(getattr(config, "max_grad_norm_critic", 10.0)))

        self.generator = generator_params
        self.fake_score = fake_params
        self.cls_params = cls_params
        self.gen_opt_state = self.gen_optimizer.init(generator_params)
        self.critic_opt_state = self.critic_optimizer.init(fake_params)
        self.cls_opt_state = self.cls_optimizer.init(cls_params)
        self.generator_ema = None
        self.ema_weight = float(getattr(config, "ema_weight", 0.0) or 0.0)
        self.ema_start_step = int(getattr(config, "ema_start_step", 0))
        self.dfake_gen_update_ratio = int(
            getattr(config, "dfake_gen_update_ratio", 1))
        self.discriminator_warmup_steps = int(
            getattr(config, "discriminator_warmup_steps", 0))
        self.gan_g_weight = float(getattr(config, "gan_g_weight", 1e-2))
        self.gan_d_weight = float(getattr(config, "gan_d_weight", 1e-2))
        self.r1_weight = float(getattr(config, "r1_weight", 0.0))
        self.r2_weight = float(getattr(config, "r2_weight", 0.0))
        self.r1_sigma = float(getattr(config, "r1_sigma", 0.01))
        self.r2_sigma = float(getattr(config, "r2_sigma", 0.01))
        self.relativistic = bool(
            getattr(config, "relativistic_discriminator", False))
        self.concat_te = bool(getattr(config, "concat_time_embeddings", False))
        self.critic_shift = float(getattr(
            config, "critic_timestep_shift",
            getattr(config, "timestep_shift", 1.0)))
        self.step = 0
        self.host_rng = np.random.default_rng(int(getattr(config, "seed", 0)))
        self._gen_fn = {}
        self._critic_fn = {}

    def _make_gen_step(self, exit_idx: int):
        bundle, obj = self.bundle, self.obj
        optimizer = self.gen_optimizer
        kw = dict(gan_g_weight=self.gan_g_weight,
                  relativistic=self.relativistic,
                  concat_time_embeddings=self.concat_te,
                  critic_shift=self.critic_shift)

        @jax.jit
        def fn(gen, fake, cls, opt_state, noise, clean, context, rng):
            def loss_fn(g):
                return gan_obj.generator_loss(
                    bundle, obj, g, fake, cls, noise, clean, context, None,
                    exit_idx, rng, **kw)
            (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(gen)
            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, gen)
            gen = optax.apply_updates(gen, updates)
            return gen, opt_state, dict(log, generator_loss=loss,
                                        generator_grad_norm=gnorm)
        return fn

    def _make_critic_step(self, exit_idx: int):
        bundle, obj = self.bundle, self.obj
        c_opt, cls_opt = self.critic_optimizer, self.cls_optimizer
        kw = dict(gan_d_weight=self.gan_d_weight,
                  relativistic=self.relativistic,
                  concat_time_embeddings=self.concat_te,
                  r1_weight=self.r1_weight, r2_weight=self.r2_weight,
                  r1_sigma=self.r1_sigma, r2_sigma=self.r2_sigma,
                  critic_shift=self.critic_shift)

        @jax.jit
        def fn(gen, fake, cls, c_state, cls_state, noise, real, context,
               rng):
            def loss_fn(f, c):
                return gan_obj.critic_loss(
                    bundle, obj, gen, f, c, noise, real, context, None,
                    exit_idx, rng, **kw)
            (loss, log), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(fake, cls)
            gf, gc = grads
            gnorm = optax.global_norm(gf)
            uf, c_state = c_opt.update(gf, c_state, fake)
            fake = optax.apply_updates(fake, uf)
            uc, cls_state = cls_opt.update(gc, cls_state, cls)
            cls = optax.apply_updates(cls, uc)
            return fake, cls, c_state, cls_state, dict(
                log, critic_loss=loss, critic_grad_norm=gnorm)
        return fn

    def train_step(self, batch: dict) -> dict:
        """batch: {'context': [B, L, D], 'latents': real clean latents
        [B, F, C, H, W]} (GAN needs real data, trainer/gan.py:248-263)."""
        context = batch["context"]
        real = batch["latents"]
        log: dict[str, Any] = {}
        in_warmup = self.step < self.discriminator_warmup_steps
        train_generator = (not in_warmup and
                           self.step % self.dfake_gen_update_ratio == 0)

        shape = list(real.shape)
        if train_generator:
            exit_idx = self.bundle.pipeline.sample_exit_index(self.host_rng)
            if exit_idx not in self._gen_fn:
                self._gen_fn[exit_idx] = self._make_gen_step(exit_idx)
            rng = jax.random.PRNGKey(int(self.host_rng.integers(2 ** 31)))
            noise = jax.random.normal(jax.random.fold_in(rng, 1), shape,
                                      real.dtype)
            self.generator, self.gen_opt_state, glog = self._gen_fn[exit_idx](
                self.generator, self.fake_score, self.cls_params,
                self.gen_opt_state, noise, real, context, rng)
            log.update({k: float(v) for k, v in glog.items()})
            if self.ema_weight > 0 and self.step >= self.ema_start_step:
                if self.generator_ema is None:
                    self.generator_ema = ema_lib.init_ema(self.generator)
                else:
                    self.generator_ema = ema_lib.update_ema(
                        self.generator_ema, self.generator,
                        decay=self.ema_weight)

        exit_idx = self.bundle.pipeline.sample_exit_index(self.host_rng)
        if exit_idx not in self._critic_fn:
            self._critic_fn[exit_idx] = self._make_critic_step(exit_idx)
        rng = jax.random.PRNGKey(int(self.host_rng.integers(2 ** 31)))
        noise = jax.random.normal(jax.random.fold_in(rng, 2), shape,
                                  real.dtype)
        (self.fake_score, self.cls_params, self.critic_opt_state,
         self.cls_opt_state, clog) = self._critic_fn[exit_idx](
            self.generator, self.fake_score, self.cls_params,
            self.critic_opt_state, self.cls_opt_state, noise, real, context,
            rng)
        log.update({k: float(v) for k, v in clog.items()})
        self.step += 1
        return log

    def save(self, path: str):
        from self_forcing_tpu.utils.checkpoints import save_pytree
        tree = {"generator": self.generator, "critic": self.fake_score,
                "critic_cls": self.cls_params}
        if self.generator_ema is not None:
            tree["generator_ema"] = self.generator_ema
        save_pytree(path, tree)

    # full-state resume — the reference GAN trainer's checkpointer-based
    # resume is broken as committed (trainer/gan.py:187-190, SURVEY §5.4);
    # mirror the sibling trainers' save_state/load_state instead so the
    # warmup/update-ratio phases (gated on self.step) survive restarts.
    def _state_tree(self, ema_like):
        return {"generator": self.generator, "critic": self.fake_score,
                "critic_cls": self.cls_params,
                "gen_opt_state": self.gen_opt_state,
                "critic_opt_state": self.critic_opt_state,
                "cls_opt_state": self.cls_opt_state,
                "ema": ema_like, "step": self.step}

    def save_state(self, path: str):
        from self_forcing_tpu.utils.checkpoints import save_pytree
        save_pytree(path, self._state_tree(self.generator_ema))

    def load_state(self, path: str, force_start_w_ema: bool = False,
                   force_reset_zero_step: bool = False):
        """Resume full trainer state.

        ``force_start_w_ema``: overwrite the live generator with the
        checkpoint's EMA weights on resume (reference flag,
        trainer/gan.py:191-194 — its implementation references a
        checkpointer that is never constructed; semantics preserved
        here).  ``force_reset_zero_step``: restart the step counter at 0
        so the discriminator warmup/update-ratio phases replay
        (trainer/gan.py:195-197)."""
        from self_forcing_tpu.utils.checkpoints import restore_pytree
        ema_like = self.generator_ema
        if ema_like is None and self.ema_weight > 0:
            ema_like = ema_lib.init_ema(self.generator)
        tree = restore_pytree(path, self._state_tree(ema_like))
        self.generator = tree["generator"]
        self.fake_score = tree["critic"]
        self.cls_params = tree["critic_cls"]
        self.gen_opt_state = tree["gen_opt_state"]
        self.critic_opt_state = tree["critic_opt_state"]
        self.cls_opt_state = tree["cls_opt_state"]
        self.generator_ema = tree["ema"]
        self.step = int(tree["step"])
        if force_start_w_ema:
            if tree["ema"] is None:
                raise ValueError(
                    "force_start_w_ema: checkpoint carries no EMA state")
            self.generator = ema_lib.ema_to_params(tree["ema"],
                                                   self.generator)
        if force_reset_zero_step:
            self.step = 0
