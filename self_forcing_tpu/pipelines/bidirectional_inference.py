"""Few-step bidirectional sampler (reference
pipeline/bidirectional_inference.py:1-71): denoise with the full-attention
model at each step of denoising_step_list, re-noising between steps."""
from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.scheduler import FlowMatchScheduler, warp_denoising_steps


@partial(jax.jit, static_argnames=("cfg", "steps"))
def sample_few_step(params, cfg: WanConfig, scheduler: FlowMatchScheduler,
                    rope: RopeTables, noise: jax.Array, context: jax.Array,
                    rng: jax.Array, steps: tuple[float, ...]) -> jax.Array:
    """noise [B, F, C, H, W] -> x0 [B, F, C, H, W]."""
    B, F, C, H, W = noise.shape
    noisy = noise
    x0 = noise
    for i, t_val in enumerate(steps):
        t = jnp.full((B, F), t_val, jnp.float32)
        flow = dit.forward_train(params, cfg, noisy, t, context, None, rope,
                                 remat=False)
        x0 = scheduler.convert_flow_pred_to_x0(
            flow.reshape(B * F, C, H, W), noisy.reshape(B * F, C, H, W),
            t.reshape(-1)).reshape(B, F, C, H, W)
        if i < len(steps) - 1:
            rng, k = jax.random.split(rng)
            eps = jax.random.normal(k, x0.shape, x0.dtype)
            t_next = jnp.full((B * F,), steps[i + 1], jnp.float32)
            noisy = scheduler.add_noise(
                x0.reshape(B * F, C, H, W), eps.reshape(B * F, C, H, W),
                t_next).reshape(B, F, C, H, W)
    return x0


class BidirectionalInferencePipeline:
    def __init__(self, args, generator_params, model_cfg: WanConfig,
                 scheduler: FlowMatchScheduler | None = None):
        self.args = args
        self.params = generator_params
        self.cfg = model_cfg
        shift = float(getattr(args, "timestep_shift", 8.0))
        self.scheduler = scheduler or FlowMatchScheduler.create(
            1000, shift=shift, training=True)
        steps = [float(s) for s in args.denoising_step_list]
        if getattr(args, "warp_denoising_step", False):
            steps = [float(s) for s in warp_denoising_steps(
                self.scheduler, [int(s) for s in args.denoising_step_list])]
        self.denoising_step_list = tuple(steps)
        self.rope = RopeTables.create(model_cfg.head_dim)

    def inference(self, noise: jax.Array, context: jax.Array,
                  rng: Optional[jax.Array] = None) -> jax.Array:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return sample_few_step(self.params, self.cfg, self.scheduler,
                               self.rope, noise, context, rng,
                               self.denoising_step_list)
