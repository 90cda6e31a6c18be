"""Score-distillation trainer — the main Self-Forcing trainer.

TPU re-design of the reference ScoreDistillationTrainer
(trainer/distillation.py):

- FSDP-wrapping of generator/real/fake/text encoder (:74-101) becomes
  pjit-sharded parameter pytrees over a ('dp','fsdp') mesh; XLA inserts the
  all-gathers/reduce-scatters FSDP does by hand.
- The alternating generator/critic updates with dfake_gen_update_ratio
  (:349-371) survive as-is; each update is ONE jitted function (loss + grad
  + optimizer + EMA) with donated state.
- The rank0-broadcast randomness sync (exit steps, rollout lengths,
  model/base.py:195-197) becomes a shared host PRNG: every process draws
  the same values by construction.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.scheduler import warp_denoising_steps
from self_forcing_tpu.training import ema as ema_lib
from self_forcing_tpu.training.objectives import dmd
from self_forcing_tpu.training.objectives.base import (ModelBundle,
                                                       ObjectiveConfig)
from self_forcing_tpu.training.optim import make_optimizer


@dataclasses.dataclass
class TrainState:
    generator: Any
    fake_score: Any
    gen_opt_state: Any
    critic_opt_state: Any
    generator_ema: Any | None
    step: int = 0


class ScoreDistillationTrainer:
    """Orchestrates DMD/SiD distillation (trainer/distillation.py:21-228).

    Construction takes explicit params pytrees (real_score is frozen,
    model/base.py:86) and a data iterator yielding dicts with
    'context' [B, L, text_dim] embeddings (the text encoder runs separately,
    jitted once per batch — trainer/distillation.py:251-263).
    """

    def __init__(self, config, generator_params, fake_params, real_params,
                 generator_cfg: WanConfig, critic_cfg: WanConfig,
                 teacher_cfg: WanConfig, neg_context, mesh=None,
                 objective: str | None = None, vae_params=None,
                 vae_cfg=None, conditioner=None, clip_params=None,
                 clip_cfg=None):
        self.config = config
        self.mesh = mesh
        obj = ObjectiveConfig(
            num_train_timestep=int(getattr(config, "num_train_timestep", 1000)),
            real_guidance_scale=float(getattr(
                config, "real_guidance_scale",
                getattr(config, "guidance_scale", 3.0))),
            fake_guidance_scale=float(getattr(config, "fake_guidance_scale", 0.0)),
            timestep_shift=float(getattr(config, "timestep_shift", 1.0)),
            ts_schedule=bool(getattr(config, "ts_schedule", True)),
            ts_schedule_max=bool(getattr(config, "ts_schedule_max", False)),
            min_score_timestep=int(getattr(config, "min_score_timestep", 0)),
            num_frame_per_block=int(getattr(config, "num_frame_per_block", 1)),
            same_step_across_blocks=bool(
                getattr(config, "same_step_across_blocks", True)),
            last_step_only=bool(getattr(config, "last_step_only", False)),
            num_training_frames=int(getattr(config, "num_training_frames", 21)),
            context_noise=float(getattr(config, "context_noise", 0)),
            denoising_loss_type=str(getattr(config, "denoising_loss_type", "flow")),
        )
        self.obj = obj
        self.objective = objective or str(
            getattr(config, "distribution_loss", "dmd"))
        assert self.objective in ("dmd", "sid"), self.objective

        gen_cfg = dataclasses.replace(
            generator_cfg,
            num_frame_per_block=obj.num_frame_per_block,
            independent_first_frame=bool(
                getattr(config, "independent_first_frame", False)))
        self.bundle = ModelBundle.create(
            gen_cfg, critic_cfg, teacher_cfg, obj,
            [int(s) for s in config.denoising_step_list],
            vae_params=vae_params, vae_cfg=vae_cfg,
            independent_first_frame=gen_cfg.independent_first_frame)
        # 14B-teacher scale-out: when the training mesh carries an 'sp'
        # axis, the frozen real_score runs sequence-parallel (ring
        # attention over sp, FSDP params GSPMD-auto on the other axes) —
        # the reference's xdit USP teacher (SURVEY §2.8,
        # wan/distributed/xdit_context_parallel.py:66-184).  Opt-out via
        # config.teacher_sequence_parallel=False.
        if (mesh is not None and "sp" in mesh.axis_names
                and mesh.shape["sp"] > 1
                and bool(getattr(config, "teacher_sequence_parallel", True))):
            self.bundle.teacher_sp_mesh = mesh
            if bool(getattr(config, "teacher_zero3_sp", False)):
                # ZeRO-3-over-sp teacher: real_params sharded over
                # fsdp x sp (28/(f*s) GB/chip at 14B), re-gathered one
                # layer at a time inside the sp forward — the v5e-8
                # fit layout (parallel/sequence.py, parallel/aot.py).
                # Callers should device_put real_params with
                # combined_fsdp_specs(mesh) to avoid a reshard.
                from self_forcing_tpu.parallel.mesh import (
                    combined_fsdp_specs)
                self.bundle.teacher_param_sp_specs = \
                    combined_fsdp_specs(real_params, mesh)
        if mesh is not None and {"dp", "fsdp", "sp"} <= set(mesh.axis_names):
            # shard the rollout's per-block cache residuals over the mesh
            # (required for the 14B-teacher fit; no-op semantics —
            # with_sharding_constraint only places data)
            from self_forcing_tpu.parallel.mesh import (
                rollout_cache_constraint)
            self.bundle.rollout_act_shard = rollout_cache_constraint(mesh)
        if getattr(config, "warp_denoising_step", False):
            warped = warp_denoising_steps(
                self.bundle.scheduler,
                [int(s) for s in config.denoising_step_list])
            self.bundle.pipeline.denoising_step_list = tuple(
                float(s) for s in warped if s != 0)

        # ---- LoRA training mode (reference model/base.py:39-72 + the
        # lora config block, configs/self_forcing_dmd.yaml:58-80)
        from self_forcing_tpu import lora as lora_mod
        lora_rank = int(getattr(config, "lora_rank", 0) or 0)
        self.train_lora_only = bool(
            getattr(config, "train_lora_only", False)) and lora_rank > 0
        if lora_rank > 0 and not lora_mod.has_lora(generator_params):
            generator_params = lora_mod.apply_lora(
                generator_params, rank=lora_rank,
                alpha=float(getattr(config, "lora_alpha", lora_rank)),
                targets=getattr(config, "lora_targets", None),
                key=jax.random.PRNGKey(
                    int(getattr(config, "seed", 0)) + 1337))
            import os
            lora_path = getattr(config, "lora_path", None) or \
                getattr(config, "generator_lora_path", None)
            if lora_path and os.path.exists(str(lora_path)):
                from self_forcing_tpu.utils import checkpoints as ckpt
                generator_params = lora_mod.load_lora_weights(
                    generator_params,
                    ckpt.load_torch_state_dict(str(lora_path)),
                    alpha=float(getattr(config, "lora_alpha", lora_rank)),
                    head_dim=gen_cfg.head_dim)

        gen_opt_kwargs = dict(
            lr=float(config.lr), beta1=float(getattr(config, "beta1", 0.0)),
            beta2=float(getattr(config, "beta2", 0.999)),
            weight_decay=float(getattr(config, "weight_decay", 0.01)),
            max_grad_norm=float(getattr(config, "max_grad_norm_generator",
                                        10.0)))
        if self.train_lora_only:
            from self_forcing_tpu.training.optim import make_lora_optimizer
            self.gen_optimizer = make_lora_optimizer(
                lora_mod.lora_label_tree(generator_params), **gen_opt_kwargs)
        else:
            self.gen_optimizer = make_optimizer(**gen_opt_kwargs)
        self.critic_optimizer = make_optimizer(
            lr=float(getattr(config, "lr_critic", config.lr)),
            beta1=float(getattr(config, "beta1_critic", 0.0)),
            beta2=float(getattr(config, "beta2_critic", 0.999)),
            weight_decay=float(getattr(config, "weight_decay", 0.01)),
            max_grad_norm=float(getattr(config, "max_grad_norm_critic", 10.0)))

        self.state = TrainState(
            generator=generator_params,
            fake_score=fake_params,
            gen_opt_state=self.gen_optimizer.init(generator_params),
            critic_opt_state=self.critic_optimizer.init(fake_params),
            generator_ema=None,
        )
        self.real_params = real_params
        self.neg_context = neg_context
        self.ema_weight = float(getattr(config, "ema_weight", 0.0) or 0.0)
        self.ema_start_step = int(getattr(config, "ema_start_step", 0))
        self.dfake_gen_update_ratio = int(
            getattr(config, "dfake_gen_update_ratio", 5))
        self.host_rng = np.random.default_rng(int(getattr(config, "seed", 0)))
        self._gen_step_fn = {}
        self._critic_step_fn = {}
        # donate the updated params/opt-state into the step (halves their
        # transient HBM — the difference between fitting and OOM at 14B-
        # teacher scale, parallel/aot.py).  Opt-in: donation invalidates
        # the caller's input buffers, so it is unsafe when the same params
        # pytree is shared with another trainer (e.g. the dryrun's GAN
        # trainer reuses the DMD generator).
        self._donate = bool(getattr(config, "donate_step_buffers", False))

        # pose/image conditioning (reference trainer/distillation.py:
        # 106-122 builds a PoseImageConditioner when use_pose_conditioning)
        self.conditioner = conditioner
        if self.conditioner is None and getattr(
                config, "use_pose_conditioning", False):
            self.conditioner = self._build_conditioner(
                config, clip_params, clip_cfg, vae_params, vae_cfg)
        self._cond_fn = {}

    @staticmethod
    def _build_conditioner(config, clip_params, clip_cfg, vae_params,
                           vae_cfg):
        import os

        from self_forcing_tpu import conditioning as cond_mod
        dw = rr = None
        pose_path = getattr(config, "pose_weights_path", None)
        if pose_path and os.path.exists(str(pose_path)):
            from self_forcing_tpu.utils import checkpoints as ckpt
            sd = ckpt.load_torch_state_dict(str(pose_path))
            dw, rr = cond_mod.load_pose_embedding_weights(sd)
            if dw is None and rr is None and bool(
                    getattr(config, "pose_weights_strict", True)):
                raise ValueError(
                    f"no dwpose_embedding./randomref_embedding_pose. "
                    f"weights in {pose_path}")
        if dw is None:
            dw = cond_mod.init_dwpose_params(jax.random.PRNGKey(7))
        if rr is None:
            rr = cond_mod.init_randomref_params(jax.random.PRNGKey(8))
        return cond_mod.PoseImageConditioner(
            dw, rr,
            drop_prob=float(getattr(config, "pose_drop_prob", 0.0)),
            clip_params=clip_params, clip_cfg=clip_cfg,
            vae_params=vae_params, vae_cfg=vae_cfg)

    def _build_cond(self, batch: dict, shape) -> dict | None:
        """Per-batch conditioning dict from raw pose/image inputs
        (trainer/distillation.py:264-276)."""
        if self.conditioner is None or "dwpose_data" not in batch:
            return None
        rng = jax.random.PRNGKey(int(self.host_rng.integers(2 ** 31)))
        ff = batch.get("first_frame")
        rr = batch.get("random_ref_dwpose")
        return self.conditioner.build_conditioning(
            jnp.asarray(batch["dwpose_data"]),
            first_frame=None if ff is None else jnp.asarray(ff),
            random_ref_dwpose=None if rr is None else jnp.asarray(rr),
            num_frames=self.obj.num_training_frames,
            height=int(shape[3]) * 8, width=int(shape[4]) * 8, rng=rng)

    # ------------------------------------------------------------- steps
    def _make_gen_step(self, exit_idx):
        """``exit_idx``: static int (same_step_across_blocks) or the
        string 'per_block' — then the jitted step takes the per-block
        exit array as a traced argument (one compile per noise shape
        instead of one per exit draw)."""
        bundle, obj = self.bundle, self.obj
        objective = self.objective
        optimizer = self.gen_optimizer
        per_block = exit_idx == "per_block"

        @partial(jax.jit, donate_argnums=(0, 3) if self._donate else ())
        def step_fn(gen_params, fake_params, real_params, opt_state,
                    noise, context, neg_context, rng, exit_arr=None,
                    cond=None):
            exits = exit_arr if per_block else exit_idx
            if objective == "dmd":
                loss_fn = lambda gp: dmd.generator_loss(
                    bundle, obj, gp, fake_params, real_params, noise,
                    context, neg_context, exits, rng, cond=cond)
            else:
                from self_forcing_tpu.training.objectives import sid
                loss_fn = lambda gp: sid.generator_loss(
                    bundle, obj, gp, fake_params, real_params, noise,
                    context, neg_context, exits, rng, cond=cond)
            (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                gen_params)
            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, gen_params)
            gen_params = optax.apply_updates(gen_params, updates)
            log = dict(log, generator_loss=loss, generator_grad_norm=gnorm)
            return gen_params, opt_state, log

        return step_fn

    def _make_critic_step(self, exit_idx):
        bundle, obj = self.bundle, self.obj
        optimizer = self.critic_optimizer
        per_block = exit_idx == "per_block"

        @partial(jax.jit, donate_argnums=(1, 2) if self._donate else ())
        def step_fn(gen_params, fake_params, opt_state, noise, context,
                    neg_context, rng, exit_arr=None, cond=None):
            loss_fn = lambda fp: dmd.critic_loss(
                bundle, obj, gen_params, fp, noise, context, neg_context,
                exit_arr if per_block else exit_idx, rng, cond=cond)
            (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                fake_params)
            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, fake_params)
            fake_params = optax.apply_updates(fake_params, updates)
            log = dict(log, critic_loss=loss, critic_grad_norm=gnorm)
            return fake_params, opt_state, log

        return step_fn

    # -------------------------------------------------------------- api
    def _sample_rollout_shape(self, base_shape):
        """Random rollout length in blocks, shared across hosts
        (model/base.py:188-198)."""
        nb = self.obj.num_frame_per_block
        min_blocks = min(21, self.obj.num_training_frames) // nb
        max_blocks = self.obj.num_training_frames // nb
        n = int(self.host_rng.integers(min_blocks, max_blocks + 1))
        shape = list(base_shape)
        shape[1] = n * nb
        return shape

    def train_step(self, batch: dict) -> dict:
        """One alternating update (trainer/distillation.py:346-371):
        generator every dfake_gen_update_ratio steps, critic every step."""
        context = batch["context"]
        log = {}
        train_generator = self.state.step % self.dfake_gen_update_ratio == 0

        base_shape = list(getattr(self.config, "image_or_video_shape",
                                  [context.shape[0], 21, 16, 60, 104]))
        cond = self._build_cond(batch, base_shape)
        shape = self._sample_rollout_shape(base_shape)
        shape[0] = context.shape[0]
        nb = self.obj.num_frame_per_block
        exit_idx = self.bundle.pipeline.sample_exit_index(
            self.host_rng, num_blocks=shape[1] // nb)
        # per-block exit arrays (same_step_across_blocks=False) are traced
        # args; a shared int exit is a static specialization key.  The
        # present conditioning keys extend the key (cond arrays are traced)
        ckey = None if cond is None else tuple(sorted(cond))
        key = ("per_block" if not isinstance(exit_idx, int) else exit_idx,
               ckey)
        exit_arr = None if isinstance(exit_idx, int) \
            else jnp.asarray(exit_idx)

        if train_generator:
            if key not in self._gen_step_fn:
                self._gen_step_fn[key] = self._make_gen_step(key[0])
            rng = jax.random.PRNGKey(int(self.host_rng.integers(2 ** 31)))
            rng, k = jax.random.split(rng)
            noise = jax.random.normal(k, shape, jnp.float32)
            gen, opt, glog = self._gen_step_fn[key](
                self.state.generator, self.state.fake_score, self.real_params,
                self.state.gen_opt_state, noise, context, self.neg_context,
                rng, exit_arr, cond)
            self.state.generator = gen
            self.state.gen_opt_state = opt
            log.update({k: float(v) for k, v in glog.items()})
            if self.ema_weight > 0 and self.state.step >= self.ema_start_step:
                if self.state.generator_ema is None:
                    self.state.generator_ema = ema_lib.init_ema(gen)
                else:
                    self.state.generator_ema = ema_lib.update_ema(
                        self.state.generator_ema, gen, decay=self.ema_weight)

        shape = self._sample_rollout_shape(shape)
        shape[0] = context.shape[0]
        exit_idx = self.bundle.pipeline.sample_exit_index(
            self.host_rng, num_blocks=shape[1] // nb)
        key = ("per_block" if not isinstance(exit_idx, int) else exit_idx,
               ckey)
        exit_arr = None if isinstance(exit_idx, int) \
            else jnp.asarray(exit_idx)
        if key not in self._critic_step_fn:
            self._critic_step_fn[key] = self._make_critic_step(key[0])
        rng = jax.random.PRNGKey(int(self.host_rng.integers(2 ** 31)))
        rng, k = jax.random.split(rng)
        noise = jax.random.normal(k, shape, jnp.float32)
        fake, opt, clog = self._critic_step_fn[key](
            self.state.generator, self.state.fake_score,
            self.state.critic_opt_state, noise, context, self.neg_context,
            rng, exit_arr, cond)
        self.state.fake_score = fake
        self.state.critic_opt_state = opt
        log.update({k: float(v) for k, v in clog.items()})

        self.state.step += 1
        return log

    def save(self, path: str):
        """Checkpoint with the reference's key layout
        (trainer/distillation.py:203-228: generator/critic/generator_ema)."""
        from self_forcing_tpu.utils.checkpoints import save_pytree
        tree = {"generator": self.state.generator,
                "critic": self.state.fake_score}
        if self.state.generator_ema is not None:
            tree["generator_ema"] = self.state.generator_ema
        save_pytree(path, tree)

    # full-state resume — the reference can't resume optimizer state
    # (SURVEY.md §5.4: generator weights only, trainer/distillation.py:
    # 182-191); here the whole TrainState round-trips through orbax.
    def save_state(self, path: str):
        from self_forcing_tpu.utils.checkpoints import save_pytree
        save_pytree(path, {
            "generator": self.state.generator,
            "fake_score": self.state.fake_score,
            "gen_opt_state": self.state.gen_opt_state,
            "critic_opt_state": self.state.critic_opt_state,
            "generator_ema": self.state.generator_ema,
            "step": self.state.step,
        })

    def load_state(self, path: str):
        from self_forcing_tpu.utils.checkpoints import restore_pytree
        like = {
            "generator": self.state.generator,
            "fake_score": self.state.fake_score,
            "gen_opt_state": self.state.gen_opt_state,
            "critic_opt_state": self.state.critic_opt_state,
            "generator_ema": self.state.generator_ema,
            "step": self.state.step,
        }
        tree = restore_pytree(path, like)
        self.state = TrainState(
            generator=tree["generator"], fake_score=tree["fake_score"],
            gen_opt_state=tree["gen_opt_state"],
            critic_opt_state=tree["critic_opt_state"],
            generator_ema=tree["generator_ema"],
            step=int(tree["step"]))
