"""Shared machinery for distillation objectives (reference model/base.py).

Holds the model bundle (causal generator + bidirectional real/fake scores),
timestep sampling, and the generator rollout glue."""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.scheduler import FlowMatchScheduler
from self_forcing_tpu.pipelines.self_forcing_training import (
    SelfForcingTrainingPipeline,
)


def _sg(t):
    return jax.lax.stop_gradient(t)


@dataclasses.dataclass(frozen=True)
class ObjectiveConfig:
    """Distillation hyperparameters (model/dmd.py:34-52 + config keys)."""

    num_train_timestep: int = 1000
    real_guidance_scale: float = 3.0
    fake_guidance_scale: float = 0.0
    timestep_shift: float = 5.0
    ts_schedule: bool = True
    ts_schedule_max: bool = False
    min_score_timestep: int = 0
    num_frame_per_block: int = 3
    same_step_across_blocks: bool = True
    last_step_only: bool = False
    num_training_frames: int = 21
    context_noise: float = 0.0
    denoising_loss_type: str = "flow"
    sid_alpha: float = 1.0  # SiD only (model/sid.py:38)

    @property
    def min_step(self) -> int:
        return int(0.02 * self.num_train_timestep)

    @property
    def max_step(self) -> int:
        return int(0.98 * self.num_train_timestep)


def sample_timestep(rng: jax.Array, min_t: int, max_t: int, batch: int,
                    num_frame: int, shift: float, clamp_lo: int,
                    clamp_hi: int) -> jax.Array:
    """Uniform per-batch timestep broadcast over frames, shifted and
    clamped (model/base.py:104-151 uniform path + model/dmd.py:154-170)."""
    t = jax.random.randint(rng, (batch, 1), min_t, max_t).astype(jnp.float32)
    t = jnp.broadcast_to(t, (batch, num_frame))
    if shift > 1:
        t = shift * (t / 1000) / (1 + (shift - 1) * (t / 1000)) * 1000
    return jnp.clip(t, clamp_lo, clamp_hi)


def sample_timestep_per_block(rng: jax.Array, min_t: int, max_t: int,
                              batch: int, num_frame: int,
                              num_frame_per_block: int,
                              independent_first_frame: bool = False
                              ) -> jax.Array:
    """Per-block random integer timesteps, equal within each block
    (model/base.py:128-151 non-uniform path).  Returns i32 [B, F]."""
    if independent_first_frame:
        nb = (num_frame - 1) // num_frame_per_block
        t0 = jax.random.randint(rng, (batch, 1), min_t, max_t)
        tb = jax.random.randint(jax.random.fold_in(rng, 1),
                                (batch, nb, 1), min_t, max_t)
        tb = jnp.broadcast_to(tb, (batch, nb, num_frame_per_block)
                              ).reshape(batch, -1)
        return jnp.concatenate([t0, tb], axis=1)
    nb = num_frame // num_frame_per_block
    tb = jax.random.randint(rng, (batch, nb, 1), min_t, max_t)
    return jnp.broadcast_to(tb, (batch, nb, num_frame_per_block)
                            ).reshape(batch, num_frame)


def align_cond_window(cond: Optional[dict], f_roll: int, f_pred: int
                      ) -> Optional[dict]:
    """Align cond['y'] with a (possibly trimmed) rollout.  The rollout
    consumed y[:, :f_roll]; trim_rollout keeps the LAST ``f_pred`` frames
    (the boundary re-encode sits at rollout position f_roll - f_pred), so
    the score models must see that TRAILING window of the conditioning —
    slicing the leading frames would pair frames f_roll-21..f_roll-1 of
    content with y built for frames 0..20."""
    if not cond or cond.get("y") is None:
        return cond
    return dict(cond, y=cond["y"][:, :f_roll][:, f_roll - f_pred:])


def model_cond(cfg: WanConfig, cond: Optional[dict]):
    """Select the conditioning entries a given model can consume (the
    reference passes the whole conditional_dict everywhere and gates
    add_condition on isinstance CausalWanModel, utils/wan_wrapper.py:
    269-277; y/clip_fea are consumed only by y-concat (in_dim > out_dim)
    / i2v models).  Returns (y, clip_fea)."""
    if not cond:
        return None, None
    y = cond.get("y") if cfg.in_dim > cfg.out_dim else None
    clip_fea = cond.get("clip_fea") if cfg.model_type == "i2v" else None
    return y, clip_fea


def score_x0(params, cfg: WanConfig, rope: RopeTables,
             scheduler: FlowMatchScheduler, noisy: jax.Array,
             t: jax.Array, context: jax.Array,
             remat: bool = True, y=None, clip_fea=None,
             sp_mesh=None, sp_axis: str = "sp",
             sp_param_specs=None) -> jax.Array:
    """Bidirectional score model forward -> x0 prediction
    (utils/wan_wrapper.py:253-349, non-causal branch).

    ``sp_mesh``: run the forward sequence-parallel over that mesh's
    ``sp_axis`` (ring attention; the 14B-teacher path — see
    ModelBundle.teacher_sp_mesh).  ``sp_param_specs``: the ZeRO-3-over-sp
    layout's manual-sp spec tree (params sharded over fsdp x sp,
    re-gathered per layer inside the forward — parallel/sequence.py)."""
    B, F, C, H, W = noisy.shape
    if sp_mesh is not None:
        from self_forcing_tpu.parallel.sequence import forward_train_sp
        flow = forward_train_sp(params, cfg, noisy, t, context, rope,
                                sp_mesh, axis_name=sp_axis, y=y,
                                clip_fea=clip_fea,
                                param_specs=sp_param_specs)
    else:
        flow = dit.forward_train(params, cfg, noisy, t, context, None, rope,
                                 y=y, clip_fea=clip_fea, remat=remat)
    return scheduler.convert_flow_pred_to_x0(
        flow.reshape(B * F, C, H, W), noisy.reshape(B * F, C, H, W),
        t.reshape(-1)).reshape(B, F, C, H, W)


def cfg_combined_score(params, cfg, rope, scheduler, noisy, t,
                       context, neg_context, guidance_scale: float,
                       remat: bool = True, cond: Optional[dict] = None,
                       sp_mesh=None, sp_axis: str = "sp",
                       sp_param_specs=None) -> jax.Array:
    """CFG: cond + (cond - uncond) * scale (model/dmd.py:93-110).  The
    image/pose conditioning rides both branches — the reference updates
    conditional AND unconditional dicts with it (trainer/distillation.py:
    274-276)."""
    y, clip_fea = model_cond(cfg, cond)
    pos = score_x0(params, cfg, rope, scheduler, noisy, t, context, remat,
                   y, clip_fea, sp_mesh=sp_mesh, sp_axis=sp_axis,
                   sp_param_specs=sp_param_specs)
    if guidance_scale == 0.0:
        return pos
    uncond = score_x0(params, cfg, rope, scheduler, noisy, t, neg_context,
                      remat, y, clip_fea, sp_mesh=sp_mesh, sp_axis=sp_axis,
                      sp_param_specs=sp_param_specs)
    return pos + (pos - uncond) * guidance_scale


@dataclasses.dataclass
class ModelBundle:
    """All params + static configs for one distillation setup
    (model/base.py:26-102: generator causal, real/fake bidirectional)."""

    generator_cfg: WanConfig
    critic_cfg: WanConfig          # fake_score
    teacher_cfg: WanConfig         # real_score
    scheduler: FlowMatchScheduler
    rope_g: RopeTables
    rope_c: RopeTables
    rope_t: RopeTables
    pipeline: SelfForcingTrainingPipeline
    # long-rollout support (rollouts > 21 frames, model/base.py:211-223):
    # the boundary frame is VAE-decoded and re-encoded as an image latent
    vae_params: Optional[dict] = None
    vae_cfg: Optional[object] = None
    independent_first_frame: bool = False
    # 14B-teacher scale-out (reference xdit USP teacher,
    # wan/distributed/xdit_context_parallel.py:66-184; SURVEY §2.8): when
    # set, the real_score forwards in compute_kl_grad run sequence-
    # parallel over this mesh's ``teacher_sp_axis`` (ring attention,
    # parallel/sequence.py) with every other mesh axis GSPMD-auto — so
    # FSDP param sharding composes and a wider-than-chip teacher fits.
    teacher_sp_mesh: Optional[object] = None
    teacher_sp_axis: str = "sp"
    # ZeRO-3-over-sp teacher layout: manual-sp PartitionSpec tree for
    # real_params (sharded over fsdp x sp; re-gathered per layer inside
    # forward_train_sp) — what fits a 14B teacher on a v5e-8.  None =
    # teacher replicated over sp (fsdp-only sharding).
    teacher_param_sp_specs: Optional[object] = None
    # activation-sharding hook for the rollout's scan-carried KV cache
    # (parallel/mesh.rollout_cache_constraint; set by the trainer when a
    # mesh is active) — the with-grad backward keeps one cache residual
    # per block, which must be sharded at production scale (the 14B AOT
    # fit, parallel/aot.py)
    rollout_act_shard: Optional[object] = None

    @classmethod
    def create(cls, generator_cfg: WanConfig, critic_cfg: WanConfig,
               teacher_cfg: WanConfig, obj: ObjectiveConfig,
               denoising_step_list, scheduler=None, vae_params=None,
               vae_cfg=None, independent_first_frame: bool = False):
        scheduler = scheduler or FlowMatchScheduler.create(
            1000, shift=obj.timestep_shift, training=True)
        pipeline = SelfForcingTrainingPipeline(
            denoising_step_list, scheduler,
            num_frame_per_block=obj.num_frame_per_block,
            same_step_across_blocks=obj.same_step_across_blocks,
            last_step_only=obj.last_step_only,
            num_max_frames=obj.num_training_frames,
            context_noise=obj.context_noise)
        return cls(generator_cfg, critic_cfg, teacher_cfg, scheduler,
                   RopeTables.create(generator_cfg.head_dim),
                   RopeTables.create(critic_cfg.head_dim),
                   RopeTables.create(teacher_cfg.head_dim),
                   pipeline, vae_params=vae_params, vae_cfg=vae_cfg,
                   independent_first_frame=independent_first_frame)

    def run_generator(self, gen_params, noise, ctx_kv, exit_idx: int,
                      rng: jax.Array, cond: Optional[dict] = None):
        """Rollout -> (trajectory[last 21 frames], gradient_mask or None,
        t_from, t_to) — matches the reference _run_generator contract
        (model/base.py:159-233) including the long-rollout slice +
        re-encode and the first-block gradient mask.

        ``cond``: optional conditioning dict with the reference
        conditional_dict keys {add_condition, y, clip_fea} (clip_fea is
        consumed by the caller when building ctx_kv)."""
        cond = cond or {}
        F = noise.shape[1]
        fs = ((noise.shape[3] // self.generator_cfg.patch_size[1])
              * (noise.shape[4] // self.generator_cfg.patch_size[2]))
        y, _ = model_cond(self.generator_cfg, cond)
        add_condition = cond.get("add_condition")
        # rollout length is sampled per step (<= num_training_frames);
        # the conditioning covers the full training window — slice the
        # leading F frames for this rollout
        if y is not None:
            y = y[:, :F]
        if add_condition is not None:
            add_condition = add_condition[:, :F * fs]
        pred, t_from, t_to = self.pipeline.inference_with_trajectory(
            gen_params, self.generator_cfg, self.rope_g, noise, ctx_kv,
            exit_idx, rng, y=y, add_condition=add_condition,
            act_shard=self.rollout_act_shard)
        pred, gradient_mask = self.trim_rollout(pred)
        return pred, gradient_mask, t_from, t_to

    def trim_rollout(self, pred: jax.Array):
        """Long-rollout handling (model/base.py:211-233): rollouts longer
        than 21 frames are sliced to the last 21, with the boundary frame
        obtained by a NO-GRAD VAE decode of frames [:-20] and re-encode of
        the final pixel frame as an image latent; the first block (or
        first frame under independent_first_frame) is gradient-masked.
        Shapes are static, so the branch resolves at trace time."""
        F = pred.shape[1]
        if F <= 21:
            return pred, None
        if self.vae_params is None:
            raise ValueError(
                "rollouts longer than 21 frames need the VAE for the "
                "boundary-frame re-encode (model/base.py:211-223); pass "
                "vae_params/vae_cfg to the trainer / ModelBundle")
        from self_forcing_tpu.models.wan import vae as vae_mod
        head = _sg(pred[:, :-20])
        # [B, T, C, h, w] latents -> decode wants channel-last [B,T,h,w,z];
        # pixels come back channel-last [B, T_pix, H, W, 3]
        pixels = vae_mod.decode(self.vae_params, self.vae_cfg,
                                head.transpose(0, 1, 3, 4, 2))
        frame = _sg(pixels[:, -1:])                     # last pixel frame
        image_latent = vae_mod.encode(
            self.vae_params, self.vae_cfg, frame).transpose(0, 1, 4, 2, 3)
        out = jnp.concatenate(
            [_sg(image_latent.astype(pred.dtype)), pred[:, -20:]], axis=1)
        mask = jnp.ones(out.shape, bool)
        lead = 1 if self.independent_first_frame             else self.pipeline.num_frame_per_block
        mask = mask.at[:, :lead].set(False)
        return out, mask
