"""Chunk-wise AR sampling with a many-step CFG solver — the 50-step causal
path (reference pipeline/causal_diffusion_inference.py).

Differences from the few-step pipeline (causal_inference.py):
- dual KV caches (positive / negative prompt) updated in lock-step
  (reference kv_cache_pos/neg, :468-517);
- a fresh UniPC/DPM++ schedule per block (:376,519-540), CFG combine on the
  flow prediction (:420-421);
- optional UniAnimate pose conditioning: dwpose 3D-CNN embedding sliced per
  block into ``add_condition`` tokens (:383-399), reference-pose 2D-CNN
  folded into the i2v ``y`` channel (:349-353);
- ``start_frame_index`` decouples RoPE position from cache position for
  long-video sliding windows (:184,256).

TPU design: the per-block 50-step denoise is ONE jitted ``lax.scan`` over
the solver schedule carrying (x, solver state, cache_pos, cache_neg); the
block loop stays in Python (one compile per distinct block shape).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from self_forcing_tpu import conditioning as cond_mod
from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan import vae as vae_mod
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.solvers import init_solver_state, make_solver


@partial(jax.jit, static_argnames=("cfg", "guidance_scale"),
         donate_argnums=(7, 8))  # both caches update in place — without
# donation every per-block call holds input+output copies of the two
# full KV caches (~2x peak cache memory)
def denoise_block_cfg(params, cfg: WanConfig, rope: RopeTables, solver,
                      noisy: jax.Array, ctx_pos: dict, ctx_neg: dict,
                      cache_pos: dit.KVCache, cache_neg: dit.KVCache,
                      start_frame: jax.Array, cache_start_frame: jax.Array,
                      guidance_scale: float,
                      add_condition: jax.Array | None = None,
                      y: jax.Array | None = None):
    """50-step CFG denoise of one block + the t=0 cache refresh
    (causal_diffusion_inference.py:376-455).  Returns
    (x0, cache_pos, cache_neg)."""
    B, Fb = noisy.shape[:2]
    timesteps = jnp.asarray(solver.timesteps)

    def step(carry, xs):
        i, t_scalar = xs
        x, state, c_pos, c_neg = carry
        t = jnp.broadcast_to(t_scalar, (B, Fb)).astype(jnp.float32)
        flow_c, c_pos = dit.forward_inference(
            params, cfg, x, t, ctx_pos, c_pos, start_frame, rope,
            y=y, add_condition=add_condition,
            cache_start_frame=cache_start_frame)
        flow_u, c_neg = dit.forward_inference(
            params, cfg, x, t, ctx_neg, c_neg, start_frame, rope,
            y=y, add_condition=add_condition,
            cache_start_frame=cache_start_frame)
        flow = flow_u + guidance_scale * (flow_c - flow_u)
        state, x = solver.step(i, state, flow, x)
        return (x, state, c_pos, c_neg), None

    state = init_solver_state(noisy.shape, noisy.dtype)
    (x0, _, cache_pos, cache_neg), _ = jax.lax.scan(
        step, (noisy, state, cache_pos, cache_neg),
        (jnp.arange(solver.num_steps, dtype=jnp.int32), timesteps))

    # cache refresh at t=0 with the clean block (:438-455)
    t0 = jnp.zeros((B, Fb), jnp.float32)
    _, cache_pos = dit.forward_inference(
        params, cfg, x0, t0, ctx_pos, cache_pos, start_frame, rope,
        y=y, add_condition=add_condition,
        cache_start_frame=cache_start_frame)
    _, cache_neg = dit.forward_inference(
        params, cfg, x0, t0, ctx_neg, cache_neg, start_frame, rope,
        y=y, add_condition=add_condition,
        cache_start_frame=cache_start_frame)
    return x0, cache_pos, cache_neg


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(5, 6))
def prime_block_cfg(params, cfg: WanConfig, rope: RopeTables,
                    ctx_pos: dict, ctx_neg: dict,
                    cache_pos: dit.KVCache, cache_neg: dit.KVCache,
                    latents: jax.Array, start_frame: jax.Array,
                    cache_start_frame: jax.Array):
    """Write clean context into both caches at t=0 (:258-312)."""
    B, Fb = latents.shape[:2]
    t = jnp.zeros((B, Fb), jnp.float32)
    _, cache_pos = dit.forward_inference(
        params, cfg, latents, t, ctx_pos, cache_pos, start_frame, rope,
        cache_start_frame=cache_start_frame)
    _, cache_neg = dit.forward_inference(
        params, cfg, latents, t, ctx_neg, cache_neg, start_frame, rope,
        cache_start_frame=cache_start_frame)
    return cache_pos, cache_neg


class CausalDiffusionInferencePipeline:
    """Reference API parity (causal_diffusion_inference.py:20-56): config
    keys num_train_timestep, timestep_shift, num_frame_per_block,
    independent_first_frame, guidance_scale, negative_prompt; 50 UniPC
    steps; optional pose weights."""

    def __init__(self, args, generator_params, model_cfg: WanConfig,
                 text_encoder=None, vae_params=None,
                 vae_cfg: vae_mod.VAEConfig = vae_mod.WAN_VAE,
                 dwpose_params=None, randomref_params=None,
                 image_encoder=None):
        self.args = args
        self.params = generator_params
        self.cfg = dataclasses.replace(
            model_cfg,
            num_frame_per_block=int(getattr(args, "num_frame_per_block", 1)),
            independent_first_frame=bool(
                getattr(args, "independent_first_frame", False)))
        self.text_encoder = text_encoder
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.image_encoder = image_encoder
        self.dwpose_params = dwpose_params
        self.randomref_params = randomref_params

        self.sampling_steps = int(getattr(args, "sampling_steps", 50))
        self.sample_solver = str(getattr(args, "sample_solver", "unipc"))
        self.shift = float(getattr(args, "timestep_shift", 8.0))
        self.guidance_scale = float(getattr(args, "guidance_scale", 5.0))
        self.solver = make_solver(self.sample_solver, self.sampling_steps,
                                  self.shift)
        self.rope = RopeTables.create(self.cfg.head_dim)
        self.num_frame_per_block = self.cfg.num_frame_per_block
        self.independent_first_frame = self.cfg.independent_first_frame

    # ------------------------------------------------------- image cond
    def encode_image(self, image: jax.Array, num_frames: int,
                     height: int, width: int):
        """CLIP visual tokens + masked first-frame VAE latent ``y``
        (reference encode_image, causal_diffusion_inference.py:151-172).

        ``image``: [B, 3, H, W] float in [-1, 1] or [B, H, W, 3] u8;
        ``num_frames``: latent frame count; height/width: PIXEL dims.
        Returns (clip_fea [B, 257, 1280], y [B, F, 20, h, w]).
        ``image_encoder`` at construction: (clip_params, clip_cfg) tuple
        or bare clip params."""
        if self.image_encoder is None:
            raise ValueError(
                "input_image given but the pipeline has no image_encoder "
                "(pass image_encoder=(clip_params, clip_cfg))")
        if self.vae_params is None:
            raise ValueError(
                "input_image conditioning needs vae_params for the "
                "first-frame latent (encode_image, reference :166-169)")
        enc = self.image_encoder
        clip_params, clip_cfg = enc if isinstance(enc, tuple) else (enc, None)
        conditioner = cond_mod.PoseImageConditioner(
            dwpose_params=self.dwpose_params,
            randomref_params=self.randomref_params,
            clip_params=clip_params, clip_cfg=clip_cfg,
            vae_params=self.vae_params, vae_cfg=self.vae_cfg)
        return conditioner.encode_image(image, num_frames, height, width)

    # ----------------------------------------------------------------- api
    def inference(self, noise: jax.Array,
                  text_prompts: Optional[List[str]] = None,
                  context: Optional[jax.Array] = None,
                  neg_context: Optional[jax.Array] = None,
                  input_image: Optional[jax.Array] = None,
                  dwpose_data: Optional[jax.Array] = None,
                  random_ref_dwpose: Optional[jax.Array] = None,
                  initial_latent: Optional[jax.Array] = None,
                  return_latents: bool = False,
                  start_frame_index: int = 0):
        """noise [B, F, C, H, W] -> video in [0, 1]; mirrors the reference
        signature (causal_diffusion_inference.py:175-185)."""
        B, F, C, H, W = noise.shape
        nb = self.num_frame_per_block
        fs = (H // self.cfg.patch_size[1]) * (W // self.cfg.patch_size[2])

        # block-schedule divisibility: the schedule below would otherwise
        # silently TRUNCATE the remainder frames / never prime a
        # non-divisible initial latent into the cache (causal_inference.py
        # asserts the same invariant)
        n_gen = F - (1 if (self.independent_first_frame
                           and initial_latent is None) else 0)
        if n_gen % nb != 0:
            raise ValueError(
                f"noise frame count {F} is not consumable by "
                f"num_frame_per_block={nb} (independent_first_frame="
                f"{self.independent_first_frame}, initial_latent="
                f"{initial_latent is not None}): {n_gen % nb} frames "
                "would be silently dropped")
        if initial_latent is not None:
            n_prime = initial_latent.shape[1] - (
                1 if self.independent_first_frame else 0)
            if n_prime % nb != 0:
                raise ValueError(
                    f"initial_latent frame count {initial_latent.shape[1]} "
                    f"is not consumable by num_frame_per_block={nb} "
                    f"(independent_first_frame="
                    f"{self.independent_first_frame}): the last "
                    f"{n_prime % nb} context frames would never be primed "
                    "into the KV cache")

        if context is None:
            context = self.text_encoder(text_prompts)
        if neg_context is None:
            if self.text_encoder is None:
                raise ValueError(
                    "CFG needs negative embeddings: pass neg_context "
                    "alongside context, or construct the pipeline with a "
                    "text encoder to encode the negative prompt")
            neg_context = self.text_encoder(
                [getattr(self.args, "negative_prompt", "")] * B)
        # ---- image conditioning (reference :322-355: encode_image builds
        # CLIP tokens + masked first-frame VAE y; clip_feature rides both
        # the cond and uncond dicts)
        image_y = None
        clip_fea = None
        if input_image is not None:
            clip_fea, image_y = self.encode_image(input_image, F, H * 8,
                                                  W * 8)
            image_y = image_y.astype(noise.dtype)
        clip_arg = clip_fea if self.cfg.model_type == "i2v" else None
        ctx_pos = dit.precompute_context(self.params, self.cfg, context,
                                         clip_arg)
        ctx_neg = dit.precompute_context(self.params, self.cfg, neg_context,
                                         clip_arg)

        num_input_frames = (initial_latent.shape[1]
                            if initial_latent is not None else 0)
        total_frames = F + num_input_frames
        cache_pos = dit.init_kv_cache(self.cfg, B, fs,
                                      max(total_frames, 21), noise.dtype)
        cache_neg = dit.init_kv_cache(self.cfg, B, fs,
                                      max(total_frames, 21), noise.dtype)

        # ---- pose conditioning (:329-353)
        dwpose_emb = None
        y = image_y                              # [B, F, 20, h, w] or None
        if dwpose_data is not None:
            x_in = cond_mod.prepare_dwpose_input(dwpose_data)
            dwpose_emb = cond_mod.dwpose_embedding(self.dwpose_params, x_in)
        if random_ref_dwpose is not None and self.randomref_params is not None:
            ref = random_ref_dwpose.astype(jnp.float32) / 255.0
            if ref.ndim == 3:
                ref = ref[None]
            ref = ref.transpose(0, 3, 1, 2)  # HWC -> CHW
            rr = cond_mod.randomref_embedding(self.randomref_params, ref)
            if y is not None:
                # randomref bias over the image y (reference :348-350)
                y = y + rr[:, None].astype(noise.dtype)
            elif self.cfg.in_dim > self.cfg.out_dim:
                # UniAnimate-style y-consuming model without an image:
                # the 20-ch randomref alone, repeated per frame
                y = jnp.broadcast_to(
                    rr[:, None].astype(noise.dtype),
                    (B, F, rr.shape[1], rr.shape[2], rr.shape[3]))
            # else: a t2v model (in_dim == out_dim) has no y channels to
            # consume — randomref without an image is a no-op, as in the
            # reference (:348-350 only adds it onto image_emb["y"])

        # ---- context priming (:256-312)
        current_start = int(start_frame_index)   # RoPE frame position
        cache_start = 0                          # cache frame position
        outputs = []
        if initial_latent is not None:
            outputs.append(initial_latent)
            rest = initial_latent
            if self.independent_first_frame:
                cache_pos, cache_neg = prime_block_cfg(
                    self.params, self.cfg, self.rope, ctx_pos, ctx_neg,
                    cache_pos, cache_neg, initial_latent[:, :1],
                    jnp.int32(current_start), jnp.int32(cache_start))
                current_start += 1
                cache_start += 1
                rest = initial_latent[:, 1:]
            for b in range(rest.shape[1] // nb):
                cache_pos, cache_neg = prime_block_cfg(
                    self.params, self.cfg, self.rope, ctx_pos, ctx_neg,
                    cache_pos, cache_neg, rest[:, b * nb:(b + 1) * nb],
                    jnp.int32(current_start), jnp.int32(cache_start))
                current_start += nb
                cache_start += nb

        # ---- block schedule (:361-366)
        all_num_frames = [nb] * ((F - (1 if (self.independent_first_frame
                                             and initial_latent is None)
                                      else 0)) // nb)
        if self.independent_first_frame and initial_latent is None:
            all_num_frames = [1] + all_num_frames

        # ---- temporal loop (:370-455)
        noise_ptr = 0
        for current_num_frames in all_num_frames:
            noisy = noise[:, noise_ptr:noise_ptr + current_num_frames]
            add_condition = None
            if dwpose_emb is not None:
                add_condition = cond_mod.pose_tokens_for_block(
                    dwpose_emb, current_start, current_num_frames
                ).astype(noise.dtype)
            y_blk = None
            if y is not None:
                # y covers the generated frames; slice this block's frames
                y_blk = y[:, noise_ptr:noise_ptr + current_num_frames]
            x0, cache_pos, cache_neg = denoise_block_cfg(
                self.params, self.cfg, self.rope, self.solver, noisy,
                ctx_pos, ctx_neg, cache_pos, cache_neg,
                jnp.int32(current_start), jnp.int32(cache_start),
                self.guidance_scale, add_condition, y_blk)
            outputs.append(x0)
            current_start += current_num_frames
            cache_start += current_num_frames
            noise_ptr += current_num_frames

        latents = jnp.concatenate(outputs, axis=1)
        if self.vae_params is None:
            video = None
        else:
            lat = latents.transpose(0, 1, 3, 4, 2)
            video = vae_mod.decode(self.vae_params, self.vae_cfg, lat)
            video = jnp.clip(video * 0.5 + 0.5, 0, 1).transpose(0, 1, 4, 2, 3)
        if return_latents:
            return video, latents
        return video
