"""ODE-regression init-stage trainer (reference trainer/ode.py).

Single generator optimizer over precomputed ODE trajectories; loss
breakdown by 250-timestep buckets for logging (trainer/ode.py:155-182).
The rank-collective logging all_gather disappears — each host logs its own
shard and the metrics writer aggregates.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.scheduler import FlowMatchScheduler, warp_denoising_steps
from self_forcing_tpu.training import ema as ema_lib
from self_forcing_tpu.training.objectives import ode_regression
from self_forcing_tpu.training.optim import make_optimizer


class ODETrainer:
    def __init__(self, config, generator_params, generator_cfg: WanConfig,
                 visualize: bool = True, mesh=None):
        """``mesh``: optional ('dp','fsdp',...) jax.sharding.Mesh — the
        generator (and its optimizer/EMA state, which inherit the
        shardings through zeros_like/jit) is FSDP-sharded over it and
        batches are split along the data axes, mirroring the reference's
        FSDP wrap of generator + text encoder (trainer/ode.py:63-74)."""
        self.config = config
        self.visualize = bool(visualize)
        self.mesh = mesh
        if mesh is not None:
            from self_forcing_tpu.parallel.mesh import shard_params
            generator_params = shard_params(generator_params, mesh)
        self.cfg = dataclasses.replace(
            generator_cfg,
            num_frame_per_block=int(getattr(config, "num_frame_per_block", 1)))
        self.rope = RopeTables.create(self.cfg.head_dim)
        self.scheduler = FlowMatchScheduler.create(
            1000, shift=float(getattr(config, "timestep_shift", 5.0)),
            training=True)
        steps = [int(s) for s in config.denoising_step_list]
        if getattr(config, "warp_denoising_step", False):
            self.denoising_step_list = [
                float(s) for s in warp_denoising_steps(self.scheduler, steps)]
        else:
            self.denoising_step_list = [float(s) for s in steps]

        self.optimizer = make_optimizer(
            lr=float(config.lr),
            beta1=float(getattr(config, "beta1", 0.9)),
            beta2=float(getattr(config, "beta2", 0.999)),
            weight_decay=float(getattr(config, "weight_decay", 0.01)),
            max_grad_norm=float(getattr(config, "max_grad_norm", 10.0)))
        self.params = generator_params
        self.opt_state = self.optimizer.init(generator_params)
        self.ema_weight = float(getattr(config, "ema_weight", 0.0) or 0.0)
        self.ema = None
        self.step = 0
        self.host_rng = np.random.default_rng(int(getattr(config, "seed", 0)))
        self._step_fn = None
        self.last_visual = None

    def _make_step(self):
        cfg, rope, scheduler = self.cfg, self.rope, self.scheduler
        step_list = tuple(self.denoising_step_list)
        nb = self.cfg.num_frame_per_block
        optimizer = self.optimizer
        i2v = bool(getattr(self.config, "i2v", False))
        visualize = self.visualize

        @jax.jit
        def step_fn(params, opt_state, ode_latent, context, rng):
            def loss_fn(p):
                return ode_regression.generator_loss(
                    p, cfg, rope, scheduler, ode_latent, context, step_list,
                    nb, rng, i2v)
            (loss, log), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            if not visualize:
                # drop the full-size latent triplet from the jit outputs:
                # materializing [B,F,C,H,W] tensors every step for data
                # that is never read costs HBM traffic + two live buffers
                log.pop("input", None)
                log.pop("output", None)
            import optax
            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, dict(log, loss=loss, grad_norm=gnorm)
        return step_fn

    def _shard_batch(self, *arrays):
        if self.mesh is None:
            return arrays
        from self_forcing_tpu.parallel.mesh import data_sharding
        n = self.mesh.shape["dp"] * self.mesh.shape["fsdp"]
        return tuple(
            jax.device_put(a, data_sharding(self.mesh))
            if hasattr(a, "shape") and a.shape and a.shape[0] % n == 0
            else a
            for a in arrays)

    def train_step(self, batch: dict) -> dict:
        """batch: {'ode_latent': [B, T, F, C, H, W], 'context': [B, L, D]}"""
        if self._step_fn is None:
            self._step_fn = self._make_step()
        rng = jax.random.PRNGKey(int(self.host_rng.integers(2 ** 31)))
        ode_latent, context = self._shard_batch(batch["ode_latent"],
                                                batch["context"])
        self.params, self.opt_state, log = self._step_fn(
            self.params, self.opt_state, ode_latent, context, rng)
        if self.ema_weight > 0:
            if self.ema is None:
                self.ema = ema_lib.init_ema(self.params)
            else:
                self.ema = ema_lib.update_ema(
                    self.ema, self.params, decay=self.ema_weight)
        self.step += 1
        # latent triplet for visualization (trainer/ode.py:190-209) —
        # stashed as device arrays; nothing is fetched unless a
        # visualization step reads them
        if self.visualize:
            self.last_visual = {"input": log.pop("input"),
                                "output": log.pop("output"),
                                "ground_truth": batch["ode_latent"][:, -1]}
        # timestep-bucket loss breakdown (trainer/ode.py:173-182)
        out = {k: np.asarray(v) for k, v in log.items()}
        t = out.pop("timestep", None)
        ul = out.pop("unnormalized_loss", None)
        scalars = {k: float(v) for k, v in out.items()}
        if t is not None and ul is not None:
            for lo in range(0, 1000, 250):
                m = (t >= lo) & (t < lo + 250)
                if m.any():
                    scalars[f"loss_bucket_{lo}"] = float(ul[m].mean())
        return scalars


    # full-state resume (reference lacks optimizer/step resume, SURVEY §5.4)
    def save_state(self, path: str):
        from self_forcing_tpu.utils.checkpoints import save_pytree
        save_pytree(path, {"params": self.params, "opt_state": self.opt_state,
                           "ema": self.ema, "step": self.step})

    def load_state(self, path: str):
        from self_forcing_tpu.utils.checkpoints import restore_pytree
        # a fresh trainer has ema=None (lazily initialized on the first
        # step), but an EMA-enabled checkpoint carries the full EMA tree:
        # restore needs a matching template
        ema_like = self.ema
        if ema_like is None and self.ema_weight > 0:
            ema_like = ema_lib.init_ema(self.params)
        like = {"params": self.params, "opt_state": self.opt_state,
                "ema": ema_like, "step": self.step}
        tree = restore_pytree(path, like)
        self.params = tree["params"]
        self.opt_state = tree["opt_state"]
        self.ema = tree["ema"]
        self.step = int(tree["step"])

    def save(self, path: str):
        from self_forcing_tpu.utils.checkpoints import save_pytree
        tree = {"generator": self.params}
        if self.ema is not None:
            tree["generator_ema"] = self.ema
        save_pytree(path, tree)
