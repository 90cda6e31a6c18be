"""Upstream Wan2.1 reference generation — WanT2V / WanI2V
(reference wan/text2video.py:110-266, wan/image2video.py:29-347).

These are the bidirectional many-step quality paths with optional
sequence parallelism (the reference's FSDP + xDiT USP options,
wan/text2video.py:68-106, become a mesh argument here).
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import jax
import jax.numpy as jnp

from self_forcing_tpu.models import clip as clip_mod
from self_forcing_tpu.models.wan import dit, vae as vae_mod
from self_forcing_tpu.models.wan.configs import WanConfig, WAN_1_3B
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.parallel.sequence import forward_train_sp
from self_forcing_tpu.solvers import init_solver_state, make_solver


class WanT2V:
    """Text-to-video 50-step CFG generation (wan/text2video.py:110-266).

    generate(prompt, size, frame_num, ...) -> pixel video [T, 3, H, W] in
    [-1, 1] like the reference's single-sample return.
    """

    def __init__(self, params, model_cfg: WanConfig = WAN_1_3B,
                 text_encoder=None, vae_params=None,
                 vae_cfg: vae_mod.VAEConfig = vae_mod.WAN_VAE,
                 mesh=None, sp_axis: str = "sp",
                 negative_prompt: str = ""):
        self.params = params
        self.cfg = model_cfg
        self.text_encoder = text_encoder
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.mesh = mesh
        self.sp_axis = sp_axis
        self.negative_prompt = negative_prompt
        self.rope = RopeTables.create(model_cfg.head_dim)

    def _forward(self, x, t, context, y=None, clip_fea=None):
        if self.mesh is not None and self.mesh.shape.get(self.sp_axis, 1) > 1:
            return forward_train_sp(self.params, self.cfg, x, t, context,
                                    self.rope, self.mesh, self.sp_axis,
                                    y=y, clip_fea=clip_fea)
        return dit.forward_train(self.params, self.cfg, x, t, context, None,
                                 self.rope, y=y, clip_fea=clip_fea,
                                 remat=False)

    def generate(self, input_prompt: str, size=(832, 480), frame_num: int = 81,
                 shift: float = 5.0, sample_solver: str = "unipc",
                 sampling_steps: int = 50, guide_scale: float = 5.0,
                 n_prompt: str = "", seed: int = -1,
                 context: Optional[jax.Array] = None,
                 neg_context: Optional[jax.Array] = None):
        W_px, H_px = size
        F = (frame_num - 1) // 4 + 1
        h, w = H_px // 8, W_px // 8
        seed = seed if seed >= 0 else 0
        rng = jax.random.PRNGKey(seed)

        if context is None:
            context = self.text_encoder([input_prompt])
        if neg_context is None:
            if self.text_encoder is None:
                raise ValueError("pass neg_context alongside context, or "
                                 "construct with a text encoder")
            neg_context = self.text_encoder(
                [n_prompt or self.negative_prompt])
        solver = make_solver(sample_solver, sampling_steps, shift)

        x = jax.random.normal(rng, (1, F, self.cfg.out_dim, h, w),
                              jnp.float32)
        state = init_solver_state(x.shape, x.dtype)
        for i, t_val in enumerate(solver.timesteps):
            t = jnp.full((1, F), float(t_val), jnp.float32)
            cond = self._forward(x, t, context)
            uncond = self._forward(x, t, neg_context)
            flow = uncond + guide_scale * (cond - uncond)
            state, x = solver.step(i, state, flow, x)

        if self.vae_params is None:
            return x
        px = vae_mod.decode(self.vae_params, self.vae_cfg,
                            x.transpose(0, 1, 3, 4, 2))
        return px.transpose(0, 1, 4, 2, 3)[0]


class WanI2V(WanT2V):
    """Image-to-video variant (wan/image2video.py:29-347): CLIP image
    tokens + masked first-frame latent y concatenated channel-wise."""

    def __init__(self, *args, clip_params=None,
                 clip_cfg: clip_mod.CLIPConfig =
                 clip_mod.CLIP_XLM_ROBERTA_VIT_H_14, **kwargs):
        super().__init__(*args, **kwargs)
        self.clip_params = clip_params
        self.clip_cfg = clip_cfg

    def encode_image_cond(self, img: jax.Array, F: int, h: int, w: int):
        """img [1, 3, H, W] in [-1,1] -> (clip_fea [1,257,1280],
        y [1, F, 20, h, w]) (wan/image2video.py mask+latent packing)."""
        clip_fea = clip_mod.encode_image(self.clip_params, self.clip_cfg,
                                         img)
        # first-frame latent through the VAE; zeros after frame 0
        px = jax.image.resize(img, (1, 3, h * 8, w * 8), "cubic")
        frames = jnp.concatenate(
            [px[:, None], jnp.zeros((1, (F - 1) * 4, 3, h * 8, w * 8),
                                    px.dtype)], axis=1)
        z = vae_mod.encode(self.vae_params, self.vae_cfg,
                           frames.transpose(0, 1, 3, 4, 2))
        z = z.transpose(0, 1, 4, 2, 3)                    # [1, F, 16, h, w]
        mask = jnp.zeros((1, F, 4, h, w), z.dtype).at[:, 0].set(1.0)
        return clip_fea, jnp.concatenate([mask, z], axis=2)

    def generate(self, input_prompt: str, img: jax.Array, size=(832, 480),
                 frame_num: int = 81, shift: float = 5.0,
                 sample_solver: str = "unipc", sampling_steps: int = 40,
                 guide_scale: float = 5.0, n_prompt: str = "",
                 seed: int = -1, context=None, neg_context=None):
        W_px, H_px = size
        F = (frame_num - 1) // 4 + 1
        h, w = H_px // 8, W_px // 8
        rng = jax.random.PRNGKey(max(seed, 0))
        if context is None:
            context = self.text_encoder([input_prompt])
        if neg_context is None:
            if self.text_encoder is None:
                raise ValueError("pass neg_context alongside context, or "
                                 "construct with a text encoder")
            neg_context = self.text_encoder(
                [n_prompt or self.negative_prompt])
        clip_fea, y = self.encode_image_cond(img, F, h, w)
        solver = make_solver(sample_solver, sampling_steps, shift)

        x = jax.random.normal(rng, (1, F, self.cfg.out_dim, h, w),
                              jnp.float32)
        state = init_solver_state(x.shape, x.dtype)
        for i, t_val in enumerate(solver.timesteps):
            t = jnp.full((1, F), float(t_val), jnp.float32)
            cond = self._forward(x, t, context, y=y, clip_fea=clip_fea)
            uncond = self._forward(x, t, neg_context, y=y,
                                   clip_fea=clip_fea)
            flow = uncond + guide_scale * (cond - uncond)
            state, x = solver.step(i, state, flow, x)
        if self.vae_params is None:
            return x
        px = vae_mod.decode(self.vae_params, self.vae_cfg,
                            x.transpose(0, 1, 3, 4, 2))
        return px.transpose(0, 1, 4, 2, 3)[0]
