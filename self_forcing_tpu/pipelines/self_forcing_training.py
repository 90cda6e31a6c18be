"""Training-time autoregressive rollout with gradient — the heart of
Self-Forcing.

Re-designs the reference SelfForcingTrainingPipeline
(pipeline/self_forcing_training.py) for JAX autodiff:

- The reference wraps most forwards in ``torch.no_grad()`` and backprops
  only through the randomly-chosen exit-step forward of each block
  (:144-194).  Here the same semantics fall out of ``lax.stop_gradient``:
  no-grad forwards have their outputs (and the carried KV cache) severed,
  so the backward pass never traverses them.
- The random exit step index is drawn on the host from a shared PRNG key
  (replacing the rank0 ``dist.broadcast`` sync, :41-58) and passed as a
  *static* argument — one compiled rollout per exit index (≤ 4 variants),
  each a clean scan.
- Blocks before the gradient window (rollouts longer than 21 frames keep
  grads only for the last 21, :137,174-194) run in a separate no-grad scan;
  the static host-known boundary splits the two scans.
- The cache-refresh forward re-noises the denoised block at
  ``context_noise`` (:199-216) and its cache output is stop_gradient'ed,
  matching the reference's no_grad refresh.

Returns (trajectory, denoised_timestep_from, denoised_timestep_to) like the
reference (:221-237).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.scheduler import FlowMatchScheduler, warp_denoising_steps


def _sg(tree):
    return jax.lax.stop_gradient(tree)


def _denoise_to_exit(params, cfg: WanConfig, scheduler, rope, ctx_kv,
                     cache, noise_blk, blk_rng, steps, exit_idx: int,
                     with_grad: bool, start_frame, y_blk=None,
                     cond_blk=None):
    """Unrolled denoise of one block through steps[0..exit_idx] (static);
    only the exit-step forward carries gradient (iff ``with_grad``).  The
    cache is read-only here (write_cache=False), so only x0 is returned.

    ``y_blk`` [B, nb, Cy, H, W] / ``cond_blk`` [B, nb*fs, 5120]: this
    block's slice of the i2v/pose conditioning (the reference forwards the
    whole conditional_dict per call, self_forcing_training.py:159,188)."""
    B, nb, C, H, W = noise_blk.shape
    noisy = noise_blk
    x0 = noisy
    for i in range(exit_idx + 1):
        t = jnp.full((B, nb), steps[i], jnp.float32)
        is_exit = (i == exit_idx)
        # write_cache=False: within-block denoise steps attend over
        # [0, write_at) + their own fresh K/V, and the refresh forward
        # afterwards rewrites the block's cache slots — the intermediate
        # writes are dead stores (same as the inference sampler).
        if is_exit and with_grad:
            # double remat (whole-forward + per-layer inside): without it
            # the block scan saves every exit forward's attention
            # internals — 37.7 GB fp32 at full 1.3B geometry (measured by
            # the 14B AOT compile, parallel/aot.py).  The backward now
            # replays the forward from (params, noisy) + the closed-over
            # cache/ctx_kv values, layer by layer.
            def _fwd(p, nz):
                flow, _ = dit.forward_inference(
                    p, cfg, nz, t, ctx_kv, cache, start_frame, rope,
                    y=y_blk, add_condition=cond_blk, write_cache=False,
                    remat=True)
                return flow
            flow = jax.checkpoint(
                _fwd,
                policy=jax.checkpoint_policies.nothing_saveable)(params,
                                                                 noisy)
            x0 = scheduler.convert_flow_pred_to_x0(
                flow.reshape(B * nb, C, H, W),
                noisy.reshape(B * nb, C, H, W),
                t.reshape(-1)).reshape(B, nb, C, H, W)
        else:
            flow, _ = dit.forward_inference(
                _sg(params), cfg, _sg(noisy), t, _sg(ctx_kv), _sg(cache),
                start_frame, rope, y=_sg(y_blk) if y_blk is not None else None,
                add_condition=_sg(cond_blk) if cond_blk is not None else None,
                write_cache=False)
            flow = _sg(flow)
            x0 = _sg(scheduler.convert_flow_pred_to_x0(
                flow.reshape(B * nb, C, H, W),
                noisy.reshape(B * nb, C, H, W),
                t.reshape(-1)).reshape(B, nb, C, H, W))
        if not is_exit:
            blk_rng, k = jax.random.split(blk_rng)
            eps = jax.random.normal(k, x0.shape, x0.dtype)
            t_next = jnp.full((B * nb,), steps[i + 1], jnp.float32)
            noisy = _sg(scheduler.add_noise(
                x0.reshape(B * nb, C, H, W),
                eps.reshape(B * nb, C, H, W),
                t_next).reshape(B, nb, C, H, W))
    return x0


def _rollout_blocks(params, cfg: WanConfig, scheduler: FlowMatchScheduler,
                    rope: RopeTables, ctx_kv: dict, cache: dit.KVCache,
                    noise: jax.Array, rng: jax.Array,
                    steps: tuple[float, ...], exit_idx,
                    context_noise: float, num_blocks: int,
                    with_grad: bool, start_frame0: jax.Array,
                    y: jax.Array | None = None,
                    add_condition: jax.Array | None = None,
                    act_shard=None):
    """Scan over blocks, denoising steps[0..exit] per block; the exit-step
    forward carries gradient iff ``with_grad``.

    ``act_shard``: optional callable KVCache -> KVCache applying sharding
    constraints to the scan-carried cache (parallel/mesh.py
    rollout_cache_constraint) — the with-grad backward keeps one cache
    residual per block, which must be sharded at production scale.

    ``exit_idx``: a python int shared by every block
    (same_step_across_blocks=True), or an i32 array [num_blocks] of
    per-block exits (the reference's same_step_across_blocks=False,
    self_forcing_training.py:136-149) — implemented as a lax.switch over
    statically-unrolled step prefixes, so each block executes exactly the
    forwards the reference would (the switch picks one branch at runtime).
    """
    B, F_total, C, H, W = noise.shape
    nb = F_total // num_blocks
    noise_blocks = noise.reshape(B, num_blocks, nb, C, H, W).transpose(
        1, 0, 2, 3, 4, 5)
    block_ids = jnp.arange(num_blocks, dtype=jnp.int32)
    rngs = jax.random.split(rng, num_blocks)
    per_block = not isinstance(exit_idx, int)
    exits = (jnp.asarray(exit_idx, jnp.int32) if per_block
             else jnp.zeros((num_blocks,), jnp.int32))
    # conditioning slices ride the scan as xs (the reference re-passes the
    # full conditional_dict every forward; here each block sees its slice)
    y_blocks = None if y is None else y.reshape(
        B, num_blocks, nb, *y.shape[2:]).transpose(1, 0, 2, 3, 4, 5)
    cond_blocks = None
    if add_condition is not None:
        Lb = add_condition.shape[1] // num_blocks
        cond_blocks = add_condition.reshape(
            B, num_blocks, Lb, add_condition.shape[2]).transpose(1, 0, 2, 3)

    def block_step(cache, xs):
        blk_id, noise_blk, blk_rng, blk_exit, y_blk, cond_blk = xs
        if act_shard is not None:
            cache = act_shard(cache)
        start_frame = start_frame0 + blk_id * nb
        if per_block:
            x0 = jax.lax.switch(
                jnp.clip(blk_exit, 0, len(steps) - 1),
                [(lambda nz, r, n=n: _denoise_to_exit(
                    params, cfg, scheduler, rope, ctx_kv, cache, nz, r,
                    steps, n, with_grad, start_frame, y_blk, cond_blk))
                 for n in range(len(steps))],
                noise_blk, blk_rng)
        else:
            x0 = _denoise_to_exit(params, cfg, scheduler, rope, ctx_kv,
                                  cache, noise_blk, blk_rng, steps,
                                  exit_idx, with_grad, start_frame,
                                  y_blk, cond_blk)

        # cache refresh: re-noise at context_noise, no-grad forward
        # (self_forcing_training.py:199-216)
        blk_rng = jax.random.fold_in(blk_rng, 7)
        k = blk_rng
        t_ctx = jnp.full((B * nb,), context_noise, jnp.float32)
        eps = jax.random.normal(k, x0.shape, x0.dtype)
        renoised = _sg(scheduler.add_noise(
            _sg(x0).reshape(B * nb, C, H, W),
            eps.reshape(B * nb, C, H, W),
            t_ctx).reshape(B, nb, C, H, W))
        _, cache = dit.forward_inference(
            _sg(params), cfg, renoised,
            jnp.full((B, nb), context_noise, jnp.float32), _sg(ctx_kv),
            _sg(cache), start_frame, rope,
            y=_sg(y_blk) if y_blk is not None else None,
            add_condition=_sg(cond_blk) if cond_blk is not None else None)
        return _sg(cache), x0

    cache, outs = jax.lax.scan(block_step, cache,
                               (block_ids, noise_blocks, rngs, exits,
                                y_blocks, cond_blocks))
    out = outs.transpose(1, 0, 2, 3, 4, 5).reshape(B, F_total, C, H, W)
    return out, cache


class SelfForcingTrainingPipeline:
    """API-parity with the reference pipeline (denoising_step_list drops a
    trailing 0 step, :24-25; same_step_across_blocks / last_step_only
    flags; kv cache sized num_max_frames, :39)."""

    def __init__(self, denoising_step_list, scheduler: FlowMatchScheduler,
                 num_frame_per_block: int = 3,
                 independent_first_frame: bool = False,
                 same_step_across_blocks: bool = True,
                 last_step_only: bool = False,
                 num_max_frames: int = 21,
                 context_noise: float = 0.0,
                 frame_seqlen: int = 1560):
        steps = [float(s) for s in denoising_step_list]
        if steps and steps[-1] == 0:
            steps = steps[:-1]
        self.denoising_step_list = tuple(steps)
        self.scheduler = scheduler
        self.num_frame_per_block = num_frame_per_block
        self.independent_first_frame = independent_first_frame
        self.same_step_across_blocks = same_step_across_blocks
        self.last_step_only = last_step_only
        self.num_max_frames = num_max_frames
        self.context_noise = float(context_noise)
        self.frame_seqlen = frame_seqlen

    def sample_exit_index(self, rng: np.random.Generator,
                          num_blocks: int | None = None):
        """Host-side draw of the exit step(s) (replaces the rank0
        broadcast, self_forcing_training.py:41-58).  Returns an int when
        same_step_across_blocks, else an i32 array of per-block exits
        (pass ``num_blocks``; reference :136-149)."""
        n = len(self.denoising_step_list)
        if self.last_step_only:
            return n - 1
        if self.same_step_across_blocks or num_blocks is None:
            return int(rng.integers(0, n))
        return np.asarray(rng.integers(0, n, size=num_blocks), np.int32)

    def denoised_timestep_bounds(self, exit_idx: int):
        """(from, to) for the ts-schedule (self_forcing_training.py:221-233)."""
        timesteps = np.asarray(self.scheduler.timesteps)
        steps = self.denoising_step_list

        def t_of(step_val):
            return 1000 - int(np.argmin(np.abs(timesteps - step_val)))

        if exit_idx == len(steps) - 1:
            return t_of(steps[exit_idx]), 0
        return t_of(steps[exit_idx]), t_of(steps[exit_idx + 1])

    def inference_with_trajectory(self, params, cfg: WanConfig,
                                  rope: RopeTables, noise: jax.Array,
                                  ctx_kv: dict, exit_idx: int,
                                  rng: jax.Array,
                                  initial_latent: Optional[jax.Array] = None,
                                  y: Optional[jax.Array] = None,
                                  add_condition: Optional[jax.Array] = None,
                                  act_shard=None):
        """Returns (trajectory [B, F_out, C, H, W],
        denoised_timestep_from, denoised_timestep_to).

        Gradient flows only through the exit-step forwards of the blocks in
        the final 21 frames.

        ``y`` [B, F, Cy, H, W] (i2v channel-concat conditioning) and
        ``add_condition`` [B, F*frame_seqlen, 5120] (UniAnimate pose
        tokens) cover the *generated* (noise) frames and are sliced per
        block inside the rollout scans — the reference instead re-passes
        the whole conditional_dict to every generator forward
        (self_forcing_training.py:123,159,211).
        """
        B, F, C, H, W = noise.shape
        nb = self.num_frame_per_block
        assert F % nb == 0
        num_blocks = F // nb
        fs = (H // cfg.patch_size[1]) * (W // cfg.patch_size[2])

        num_input_frames = (initial_latent.shape[1]
                            if initial_latent is not None else 0)
        num_output_frames = F + num_input_frames
        cache = dit.init_kv_cache(cfg, B, fs, self.num_max_frames,
                                  noise.dtype)

        start = jnp.int32(0)
        outputs = []
        if initial_latent is not None:
            from self_forcing_tpu.pipelines.causal_inference import prime_block
            outputs.append(_sg(initial_latent))
            cache = _sg(prime_block(params, cfg, rope, ctx_kv, cache,
                                    initial_latent, start))
            start = start + num_input_frames

        # split blocks into no-grad prefix and grad suffix (last 21 frames)
        start_gradient_frame = num_output_frames - 21
        grad_start_block = max(
            0, -(-max(0, start_gradient_frame - num_input_frames) // nb))

        per_block = not isinstance(exit_idx, int)
        exit_pre = exit_idx if not per_block \
            else jnp.asarray(exit_idx, jnp.int32)[:grad_start_block]
        exit_post = exit_idx if not per_block \
            else jnp.asarray(exit_idx, jnp.int32)[grad_start_block:]

        split_f = grad_start_block * nb
        split_tok = split_f * fs
        y_pre = y[:, :split_f] if y is not None else None
        y_post = y[:, split_f:] if y is not None else None
        cond_pre = add_condition[:, :split_tok] \
            if add_condition is not None else None
        cond_post = add_condition[:, split_tok:] \
            if add_condition is not None else None

        rng1, rng2 = jax.random.split(rng)
        if grad_start_block > 0:
            pre, cache = _rollout_blocks(
                params, cfg, self.scheduler, rope, ctx_kv, cache,
                noise[:, :split_f], rng1,
                self.denoising_step_list, exit_pre, self.context_noise,
                grad_start_block, False, start, y_pre, cond_pre,
                act_shard=act_shard)
            outputs.append(_sg(pre))
            cache = _sg(cache)
            start = start + grad_start_block * nb

        post, cache = _rollout_blocks(
            params, cfg, self.scheduler, rope, ctx_kv, cache,
            noise[:, split_f:], rng2,
            self.denoising_step_list, exit_post, self.context_noise,
            num_blocks - grad_start_block, True, start, y_post, cond_post,
            act_shard=act_shard)
        outputs.append(post)

        trajectory = jnp.concatenate(outputs, axis=1)
        tfrom, tto = self.denoised_timestep_bounds(exit_idx) \
            if (self.same_step_across_blocks and not per_block) \
            else (None, None)
        return trajectory, tfrom, tto
