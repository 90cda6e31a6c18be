"""Many-step CFG sampling with the bidirectional Wan model — the quality
reference path (reference pipeline/bidirectional_diffusion_inference.py).

50-step UniPC (or DPM++) with classifier-free guidance; the whole sampling
loop is one jitted ``lax.scan`` over the solver schedule (coefficients are
device constants indexed by the scan counter — see solvers.py), so there is
no host round-trip between steps.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan import vae as vae_mod
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.solvers import init_solver_state, make_solver


@partial(jax.jit, static_argnames=("cfg", "guidance_scale"))
def sample_cfg(params, cfg: WanConfig, rope: RopeTables, solver,
               noise: jax.Array, context: jax.Array,
               neg_context: jax.Array, guidance_scale: float) -> jax.Array:
    """Full CFG sampling loop (bidirectional_diffusion_inference.py:60-76):
    flow = uncond + scale * (cond - uncond), then one solver step."""
    B, F = noise.shape[:2]
    timesteps = jnp.asarray(solver.timesteps)

    def model(x, t_scalar):
        t = jnp.broadcast_to(t_scalar, (B, F)).astype(jnp.float32)
        cond = dit.forward_train(params, cfg, x, t, context, None, rope,
                                 remat=False)
        uncond = dit.forward_train(params, cfg, x, t, neg_context, None,
                                   rope, remat=False)
        return uncond + guidance_scale * (cond - uncond)

    def step(carry, xs):
        i, t = xs
        x, state = carry
        flow = model(x, t)
        state, x = solver.step(i, state, flow, x)
        return (x, state), None

    state = init_solver_state(noise.shape, noise.dtype)
    (x, _), _ = jax.lax.scan(
        step, (noise, state),
        (jnp.arange(solver.num_steps, dtype=jnp.int32), timesteps))
    return x


class BidirectionalDiffusionInferencePipeline:
    """API parity with the reference class: shift 8.0, 50 UniPC steps,
    guidance from args (bidirectional_diffusion_inference.py:26-30)."""

    def __init__(self, args, generator_params, model_cfg: WanConfig,
                 text_encoder=None, vae_params=None,
                 vae_cfg: vae_mod.VAEConfig = vae_mod.WAN_VAE):
        self.args = args
        self.params = generator_params
        self.cfg = model_cfg
        self.text_encoder = text_encoder
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.sampling_steps = int(getattr(args, "sampling_steps", 50))
        self.sample_solver = str(getattr(args, "sample_solver", "unipc"))
        self.shift = float(getattr(args, "shift", 8.0))
        self.guidance_scale = float(getattr(args, "guidance_scale", 5.0))
        self.solver = make_solver(self.sample_solver, self.sampling_steps,
                                  self.shift)
        self.rope = RopeTables.create(self.cfg.head_dim)

    def inference(self, noise: jax.Array,
                  text_prompts: Optional[List[str]] = None,
                  context: Optional[jax.Array] = None,
                  neg_context: Optional[jax.Array] = None,
                  return_latents: bool = False):
        """noise [B, F, C, H, W] -> video [B, F_pix, 3, H*8, W*8] in [0,1]."""
        if context is None:
            context = self.text_encoder(text_prompts)
            neg_context = self.text_encoder(
                [getattr(self.args, "negative_prompt", "")]
                * noise.shape[0])
        latents = sample_cfg(self.params, self.cfg, self.rope, self.solver,
                             noise, context, neg_context,
                             self.guidance_scale)
        if self.vae_params is None:
            video = None
        else:
            lat = latents.transpose(0, 1, 3, 4, 2)
            video = vae_mod.decode(self.vae_params, self.vae_cfg, lat)
            video = jnp.clip(video * 0.5 + 0.5, 0, 1).transpose(0, 1, 4, 2, 3)
        if return_latents:
            return video, latents
        return video
