"""Flow-matching noise schedule, TPU-native.

Re-implements the semantics of the reference's ``FlowMatchScheduler``
(utils/scheduler.py:106-194) and the flow↔x0 conversions
(utils/wan_wrapper.py:204-251) as pure functions over precomputed sigma
tables, so everything is jittable with static shapes.

Design differences from the reference (deliberate, TPU-first):
- The reference computes conversions in float64; TPUs have no fast fp64, so
  we compute in float32.  The operations are a single gather + one or two
  fused multiply-adds, and the sigma tables themselves are built in float64
  on the host before being cast — the residual error vs. the fp64 reference
  is ~1e-7 relative, validated in tests/test_scheduler.py.
- ``timestep -> sigma`` lookup is the same nearest-timestep argmin gather
  as the reference (utils/scheduler.py:148-150), vectorized over a [B*F]
  timestep tensor.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FlowMatchScheduler:
    """Shifted rectified-flow schedule.

    sigmas' = shift * s / (1 + (shift - 1) * s) over a linspace s
    (reference utils/scheduler.py:118-133); ``timesteps = 1000 * sigmas``.

    The instance is a registered pytree so it can be closed over or passed
    through jit boundaries; its arrays live on device.
    """

    sigmas: jax.Array          # [num_steps] f32, descending
    timesteps: jax.Array       # [num_steps] f32, descending
    training_weights: jax.Array | None  # [num_steps] f32 or None
    shift: float = 5.0
    num_train_timesteps: int = 1000

    # ---------------------------------------------------------- pytree
    def tree_flatten(self):
        return ((self.sigmas, self.timesteps, self.training_weights),
                (self.shift, self.num_train_timesteps))

    @classmethod
    def tree_unflatten(cls, aux, children):
        sigmas, timesteps, training_weights = children
        shift, num_train_timesteps = aux
        return cls(sigmas, timesteps, training_weights, shift, num_train_timesteps)

    # ---------------------------------------------------------- ctor
    @classmethod
    def create(cls, num_inference_steps: int = 1000, shift: float = 5.0,
               sigma_min: float = 0.0, sigma_max: float = 1.0,
               extra_one_step: bool = True, training: bool = False,
               num_train_timesteps: int = 1000,
               denoising_strength: float = 1.0) -> "FlowMatchScheduler":
        """Build sigma tables (host, float64) then move to device float32.

        Mirrors FlowMatchScheduler.set_timesteps (utils/scheduler.py:118-141).
        The production config uses shift=8.0 by default / 5.0 for training,
        sigma_min=0.0, extra_one_step=True, 1000 steps
        (utils/wan_wrapper.py:171-174).
        """
        sigma_start = sigma_min + (sigma_max - sigma_min) * denoising_strength
        if extra_one_step:
            sigmas = np.linspace(sigma_start, sigma_min,
                                 num_inference_steps + 1, dtype=np.float64)[:-1]
        else:
            sigmas = np.linspace(sigma_start, sigma_min,
                                 num_inference_steps, dtype=np.float64)
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        timesteps = sigmas * num_train_timesteps

        training_weights = None
        if training:
            # Gaussian bump weights (utils/scheduler.py:134-141)
            x = timesteps
            y = np.exp(-2 * ((x - num_inference_steps / 2) / num_inference_steps) ** 2)
            y_shifted = y - y.min()
            training_weights = jnp.asarray(
                y_shifted * (num_inference_steps / y_shifted.sum()), dtype=jnp.float32)

        return cls(
            sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
            timesteps=jnp.asarray(timesteps, dtype=jnp.float32),
            training_weights=training_weights,
            shift=shift,
            num_train_timesteps=num_train_timesteps,
        )

    # ---------------------------------------------------------- lookups
    def timestep_id(self, timestep: jax.Array) -> jax.Array:
        """Nearest-timestep index (utils/scheduler.py:148-150).  [...] -> [...] i32."""
        t = jnp.asarray(timestep, jnp.float32)
        return jnp.argmin(
            jnp.abs(self.timesteps[None, :] - t.reshape(-1)[:, None]), axis=1
        ).reshape(t.shape)

    def sigma(self, timestep: jax.Array) -> jax.Array:
        return self.sigmas[self.timestep_id(timestep)]

    # ---------------------------------------------------------- core ops
    def add_noise(self, sample: jax.Array, noise: jax.Array,
                  timestep: jax.Array) -> jax.Array:
        """x_t = (1 - sigma_t) x_0 + sigma_t eps  (utils/scheduler.py:159-176).

        ``timestep``: [B] (or [B, F] flattened by the caller) matching
        sample.shape[0]; broadcast over remaining dims.
        """
        sigma = _bcast(self.sigma(timestep), sample)
        out = (1.0 - sigma) * sample.astype(jnp.float32) + sigma * noise.astype(jnp.float32)
        return out.astype(noise.dtype)

    def step(self, model_output: jax.Array, timestep: jax.Array,
             sample: jax.Array, to_final: bool = False) -> jax.Array:
        """Euler step x_{t-1} = x_t + v * (sigma_next - sigma_t)
        (utils/scheduler.py:143-157)."""
        tid = self.timestep_id(timestep)
        sigma = _bcast(self.sigmas[tid], sample)
        n = self.sigmas.shape[0]
        next_sigma = jnp.where(tid + 1 >= n, 0.0, self.sigmas[jnp.minimum(tid + 1, n - 1)])
        if to_final:
            next_sigma = jnp.zeros_like(next_sigma)
        next_sigma = _bcast(next_sigma, sample)
        out = sample.astype(jnp.float32) + model_output.astype(jnp.float32) * (next_sigma - sigma)
        return out.astype(sample.dtype)

    def training_target(self, sample: jax.Array, noise: jax.Array,
                        timestep: jax.Array) -> jax.Array:
        """Flow-matching target v = eps - x0 (utils/scheduler.py:178-180)."""
        del timestep
        return noise - sample

    def training_weight(self, timestep: jax.Array) -> jax.Array:
        """Per-timestep Gaussian weights (utils/scheduler.py:182-194)."""
        assert self.training_weights is not None, "create(training=True) required"
        return self.training_weights[self.timestep_id(timestep)]

    # ------------------------------------------------- pred conversions
    def convert_flow_pred_to_x0(self, flow_pred: jax.Array, xt: jax.Array,
                                timestep: jax.Array) -> jax.Array:
        """x0 = x_t - sigma_t * v   (utils/wan_wrapper.py:204-228)."""
        sigma = _bcast(self.sigma(timestep), xt)
        out = xt.astype(jnp.float32) - sigma * flow_pred.astype(jnp.float32)
        return out.astype(flow_pred.dtype)

    def convert_x0_to_flow_pred(self, x0_pred: jax.Array, xt: jax.Array,
                                timestep: jax.Array) -> jax.Array:
        """v = (x_t - x0) / sigma_t  (utils/wan_wrapper.py:230-251)."""
        sigma = _bcast(self.sigma(timestep), xt)
        out = (xt.astype(jnp.float32) - x0_pred.astype(jnp.float32)) / sigma
        return out.astype(x0_pred.dtype)

    # Noise-pred conversions for the DDPM-style interface
    # (utils/scheduler.py:26-75).  Under flow matching alphas_cumprod is not
    # defined; these operate on the rectified-flow parameterization instead:
    # x_t = (1-s) x0 + s eps  =>  eps = (x_t - (1-s) x0) / s.
    def convert_x0_to_noise(self, x0: jax.Array, xt: jax.Array,
                            timestep: jax.Array) -> jax.Array:
        sigma = _bcast(self.sigma(timestep), xt)
        out = (xt.astype(jnp.float32) - (1.0 - sigma) * x0.astype(jnp.float32)) / sigma
        return out.astype(x0.dtype)

    def convert_noise_to_x0(self, noise: jax.Array, xt: jax.Array,
                            timestep: jax.Array) -> jax.Array:
        sigma = _bcast(self.sigma(timestep), xt)
        out = (xt.astype(jnp.float32) - sigma * noise.astype(jnp.float32)) / (1.0 - sigma)
        return out.astype(noise.dtype)


def _bcast(per_batch: jax.Array, like: jax.Array) -> jax.Array:
    """Reshape a [B] array to [B, 1, 1, ...] matching ``like``'s rank."""
    return per_batch.reshape(per_batch.shape + (1,) * (like.ndim - per_batch.ndim))


@partial(jax.jit, static_argnames=("num_train_timesteps",))
def shift_timestep(timestep: jax.Array, shift: float,
                   num_train_timesteps: int = 1000) -> jax.Array:
    """t' = shift*(t/T) / (1 + (shift-1)*(t/T)) * T — the trainer-side timestep
    warp (model/dmd.py:166-169)."""
    t = timestep.astype(jnp.float32) / num_train_timesteps
    return shift * t / (1 + (shift - 1) * t) * num_train_timesteps


def warp_denoising_steps(scheduler: FlowMatchScheduler,
                         denoising_step_list: list[int]) -> np.ndarray:
    """Map raw [1000, 750, 500, 250] steps through the shifted schedule:
    timesteps[1000 - t] with a trailing 0 appended
    (pipeline/causal_inference.py:29-31)."""
    timesteps = np.concatenate(
        [np.asarray(scheduler.timesteps), np.zeros((1,), np.float32)])
    return timesteps[scheduler.num_train_timesteps - np.asarray(denoising_step_list)]
