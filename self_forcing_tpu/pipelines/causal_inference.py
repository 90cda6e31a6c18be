"""Chunk-wise autoregressive few-step inference — the production path.

Re-designs the reference's CausalInferencePipeline
(pipeline/causal_inference.py) TPU-first:

- The reference's Python temporal loop with 5 sequential synchronizing
  forwards per block (:176-235) becomes ONE jitted ``lax.scan`` over blocks;
  the 4 denoising steps are unrolled inside (static step list), the KV cache
  is scan-carried state, and nothing syncs with the host until the final
  video is fetched.
- The text encode happens once per prompt (precompute_context ≙ the
  reference's crossattn_cache priming).
- For streaming serving there is a per-block ``stream()`` generator that
  yields denoised latent chunks; the demo overlap-decodes them while the
  next chunk is being denoised (TPU async dispatch gives the overlap for
  free).

Timeline per 21-frame video, matching the reference exactly:
7 blocks x (4 denoise + 1 cache-refresh) DiT forwards of 4680 tokens
(causal_inference.py:177-235), then VAE decode.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.models.wan import vae as vae_mod
from self_forcing_tpu.scheduler import FlowMatchScheduler, warp_denoising_steps


@partial(jax.jit, static_argnames=("cfg", "steps", "context_noise",
                                   "num_blocks"),
         donate_argnums=(5,))  # the KV cache updates in place
def generate_blocks(params, cfg: WanConfig, scheduler: FlowMatchScheduler,
                    rope: RopeTables, ctx_kv: dict, cache: dit.KVCache,
                    noise: jax.Array, rng: jax.Array,
                    steps: tuple[float, ...], context_noise: float,
                    num_blocks: int, start_frame0: jax.Array
                    ) -> tuple[jax.Array, dit.KVCache]:
    """Jitted scan over ``num_blocks`` chunks of num_frame_per_block frames.

    noise: [B, num_blocks*nb, C, H, W]; returns (denoised latents of the
    same shape, final cache).  ``start_frame0`` offsets the rope/cache for
    video-extension calls (initial context already primed into ``cache``).
    """
    B, F_total, C, H, W = noise.shape
    nb = F_total // num_blocks
    noise_blocks = noise.reshape(B, num_blocks, nb, C, H, W).transpose(
        1, 0, 2, 3, 4, 5)
    block_ids = jnp.arange(num_blocks, dtype=jnp.int32)
    rngs = jax.random.split(rng, num_blocks)

    def block_step(cache, xs):
        blk_id, noise_blk, blk_rng = xs
        start_frame = start_frame0 + blk_id * nb
        noisy = noise_blk
        x0 = noisy
        for i, t_val in enumerate(steps):
            t = jnp.full((B, nb), t_val, jnp.float32)
            flow, cache = dit.forward_inference(
                params, cfg, noisy, t, ctx_kv, cache, start_frame, rope,
                write_cache=False)  # the refresh below writes the block
            x0 = scheduler.convert_flow_pred_to_x0(
                flow.reshape(B * nb, C, H, W),
                noisy.reshape(B * nb, C, H, W),
                t.reshape(-1)).reshape(B, nb, C, H, W)
            if i < len(steps) - 1:
                blk_rng, k = jax.random.split(blk_rng)
                eps = jax.random.normal(k, x0.shape, x0.dtype)
                t_next = jnp.full((B * nb,), steps[i + 1], jnp.float32)
                noisy = scheduler.add_noise(
                    x0.reshape(B * nb, C, H, W),
                    eps.reshape(B * nb, C, H, W),
                    t_next).reshape(B, nb, C, H, W)
        # cache refresh with clean context (causal_inference.py:226-235)
        t_ctx = jnp.full((B, nb), context_noise, jnp.float32)
        _, cache = dit.forward_inference(
            params, cfg, x0, t_ctx, ctx_kv, cache, start_frame, rope)
        return cache, x0

    cache, outs = jax.lax.scan(block_step, cache,
                               (block_ids, noise_blocks, rngs))
    out = outs.transpose(1, 0, 2, 3, 4, 5).reshape(B, F_total, C, H, W)
    return out, cache


@partial(jax.jit, static_argnames=("cfg", "steps", "static_kv_hi"),
         donate_argnums=(5,))
def denoise_block(params, cfg: WanConfig, scheduler: FlowMatchScheduler,
                  rope: RopeTables, ctx_kv: dict, cache: dit.KVCache,
                  noise_blk: jax.Array, rng: jax.Array,
                  steps: tuple[float, ...], start_frame: jax.Array,
                  static_kv_hi: int | None = None):
    """One block's 4-step denoise WITHOUT the cache refresh — the
    streaming path dispatches the VAE decode of this block before the
    refresh so time-to-first-chunk excludes it (the refresh only feeds
    the NEXT block's context; the reference demo likewise skips it on the
    last block, demo.py:396-404).

    ``static_kv_hi``: static token count already in the cache (the python
    block loop knows it) — sizes the Pallas attention grid to the live
    window, at the cost of one compiled specialization per block."""
    B, nb, C, H, W = noise_blk.shape
    noisy = noise_blk
    x0 = noisy
    blk_rng = rng
    # windowed mode: the CALLER host-schedules dit.compact_cache between
    # blocks (the block cadence is static), so no compaction cond exists
    # inside this donated program — its untaken branch would cost a
    # full-buffer HLO temp (assume_compacted below; no-op globally)
    for i, t_val in enumerate(steps):
        t = jnp.full((B, nb), t_val, jnp.float32)
        # write_cache=False: the refresh pass (or nothing, on the last
        # block) provides the context for the NEXT block; within-block
        # steps read the cache window [0, write_at) + their own fresh K/V
        flow, cache = dit.forward_inference(
            params, cfg, noisy, t, ctx_kv, cache, start_frame, rope,
            static_kv_hi=static_kv_hi, write_cache=False,
            assume_compacted=True)
        x0 = scheduler.convert_flow_pred_to_x0(
            flow.reshape(B * nb, C, H, W),
            noisy.reshape(B * nb, C, H, W),
            t.reshape(-1)).reshape(B, nb, C, H, W)
        if i < len(steps) - 1:
            blk_rng, k = jax.random.split(blk_rng)
            eps = jax.random.normal(k, x0.shape, x0.dtype)
            t_next = jnp.full((B * nb,), steps[i + 1], jnp.float32)
            noisy = scheduler.add_noise(
                x0.reshape(B * nb, C, H, W),
                eps.reshape(B * nb, C, H, W),
                t_next).reshape(B, nb, C, H, W)
    return x0, cache


@partial(jax.jit, static_argnames=("cfg", "context_noise", "static_kv_hi"),
         donate_argnums=(4,))
def refresh_block(params, cfg: WanConfig, rope: RopeTables, ctx_kv: dict,
                  cache: dit.KVCache, x0: jax.Array, rng: jax.Array,
                  context_noise: float, start_frame: jax.Array,
                  static_kv_hi: int | None = None) -> dit.KVCache:
    """Re-run the denoised block at ``context_noise`` to write clean
    context into the cache (causal_inference.py:226-235).

    The reference INFERENCE refresh passes the denoised block CLEAN with
    only the timestep set to context_noise — no re-noising (only the
    TRAINING rollout adds context noise, self_forcing_training.py:199-206,
    which pipelines/self_forcing_training.py mirrors).  ``rng`` is kept in
    the signature for call-site stability but unused."""
    B, nb = x0.shape[:2]
    del rng
    t_ctx = jnp.full((B, nb), float(context_noise), jnp.float32)
    # assume_compacted: the caller pre-ran dit.compact_cache before the
    # block's denoise (see denoise_block), and the refresh write of the
    # SAME block fits by construction
    _, cache = dit.forward_inference(params, cfg, x0, t_ctx, ctx_kv, cache,
                                     start_frame, rope,
                                     static_kv_hi=static_kv_hi,
                                     assume_compacted=True)
    return cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(4,))
def prime_block(params, cfg: WanConfig, rope: RopeTables, ctx_kv: dict,
                cache: dit.KVCache, latents: jax.Array,
                start_frame: jax.Array) -> dit.KVCache:
    """Write clean context latents into the KV cache at timestep 0
    (i2v / video extension priming, causal_inference.py:136-169)."""
    B, Fb = latents.shape[:2]
    t = jnp.zeros((B, Fb), jnp.float32)
    _, cache = dit.forward_inference(params, cfg, latents, t, ctx_kv, cache,
                                     start_frame, rope)
    return cache


class CausalInferencePipeline:
    """Few-step chunk-wise AR sampler (reference
    pipeline/causal_inference.py:9-313), API-parity ``inference()`` plus a
    TPU streaming generator.

    Args hold the same config keys: denoising_step_list,
    warp_denoising_step, num_frame_per_block, independent_first_frame,
    context_noise (SURVEY.md §5.6).
    """

    def __init__(self, args, generator_params, model_cfg: WanConfig,
                 text_encoder=None, vae_params=None,
                 vae_cfg: vae_mod.VAEConfig = vae_mod.WAN_VAE,
                 scheduler: FlowMatchScheduler | None = None,
                 mesh=None, tp_axis: str = "tp"):
        """``mesh``: optional ('tp',) Mesh — the whole sampler then runs
        tensor-parallel over it (Megatron-style head/ffn sharding,
        parallel/tensor.py; the Wan-14B single-host streaming path).
        ``generator_params`` must already be sharded with
        parallel.tensor.shard_params_tp; batch size is limited to 1."""
        self.args = args
        self.params = generator_params
        self.mesh = mesh
        self.tp_axis = tp_axis
        self.cfg = dataclasses.replace(
            model_cfg,
            num_frame_per_block=int(getattr(args, "num_frame_per_block", 1)),
            independent_first_frame=bool(
                getattr(args, "independent_first_frame", False)),
        )
        self.text_encoder = text_encoder
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        shift = float(getattr(args, "timestep_shift", 8.0))
        self.scheduler = scheduler or FlowMatchScheduler.create(
            1000, shift=shift, training=True)
        self.rope = RopeTables.create(self.cfg.head_dim)

        steps = [float(s) for s in args.denoising_step_list]
        if getattr(args, "warp_denoising_step", False):
            steps = [float(s) for s in
                     warp_denoising_steps(self.scheduler, [int(s) for s in
                                                           args.denoising_step_list])]
        self.denoising_step_list = tuple(steps)
        self.context_noise = float(getattr(args, "context_noise", 0))
        self.num_frame_per_block = self.cfg.num_frame_per_block
        self._cache = None

    # ------------------------------------------------------------- utils
    def _frame_seqlen(self, height: int, width: int) -> int:
        return (height // self.cfg.patch_size[1]) * (width // self.cfg.patch_size[2])

    def _init_cache(self, batch: int, fs: int, num_frames: int, dtype,
                    slack: bool = True):
        """Reuse the previous call's cache buffers when the geometry
        matches (reference cache reuse/reset between calls,
        causal_inference.py:112-132): reset only zeroes the index
        scalars and the kmax bound — re-zeroing the ~9.8 GB k/v arrays
        costs ~25 ms of time-to-first-chunk for nothing (stale rows are
        never visible: attention reads [attn_lo, local_end)).

        ``slack=False`` (the scan-based ``inference()`` path): size a
        windowed buffer at the reference's buffer==window even when the
        config requests a slack buffer — inside lax.scan the compaction
        runs as forward_inference's lax.cond, whose untaken branch
        allocates a full-buffer HLO temp, so a slack buffer would
        double that temp for zero benefit (only the host-scheduled
        stream() loop can exploit slack)."""
        cfg = self.cfg
        if not slack and cfg.local_attn_size != -1 \
                and cfg.windowed_buffer_frames is not None:
            import dataclasses
            cfg = dataclasses.replace(cfg, windowed_buffer_frames=None)
        sig = (batch, fs, num_frames, dtype,
               -1 if cfg.local_attn_size == -1 else cfg.buffer_frames)
        if getattr(self, "_cache_sig", None) == sig and \
                getattr(self, "_cache", None) is not None:
            return dit.reset_kv_cache(self._cache)
        self._cache_sig = sig
        if self.mesh is not None:
            from self_forcing_tpu.parallel import tensor as tpmod
            return tpmod.init_kv_cache_tp(cfg, self.mesh, batch, fs,
                                          num_frames, dtype,
                                          axis=self.tp_axis)
        return dit.init_kv_cache(cfg, batch, fs, num_frames, dtype)

    def encode_text(self, text_prompts: List[str]) -> jax.Array:
        assert self.text_encoder is not None, \
            "pass precomputed `context` or construct with a text encoder"
        return self.text_encoder(text_prompts)

    # TP-dispatching seams: single-chip jitted ops, or their shard_map'd
    # tensor-parallel twins when a ('tp',) mesh was given (the numbers
    # match up to psum reassociation — tests/test_tensor_parallel.py)
    def _precompute_context(self, context):
        if self.mesh is not None:
            from self_forcing_tpu.parallel import tensor as tpmod
            return tpmod.precompute_context_tp(self.params, self.cfg,
                                               context, self.mesh,
                                               axis=self.tp_axis)
        return dit.precompute_context(self.params, self.cfg, context)

    def _prime(self, ctx_kv, cache, latents, start):
        if self.mesh is not None:
            from self_forcing_tpu.parallel import tensor as tpmod
            return tpmod.prime_block_tp(self.params, self.cfg, self.rope,
                                        ctx_kv, cache, latents, start,
                                        self.mesh, axis=self.tp_axis)
        return prime_block(self.params, self.cfg, self.rope, ctx_kv, cache,
                           latents, start)

    def _generate(self, ctx_kv, cache, noise, rng, num_blocks, start):
        if self.mesh is not None:
            from self_forcing_tpu.parallel import tensor as tpmod
            return tpmod.generate_blocks_tp(
                self.params, self.cfg, self.scheduler, self.rope, ctx_kv,
                cache, noise, rng, self.denoising_step_list,
                self.context_noise, num_blocks, start, self.mesh,
                axis=self.tp_axis)
        return generate_blocks(
            self.params, self.cfg, self.scheduler, self.rope, ctx_kv, cache,
            noise, rng, self.denoising_step_list, self.context_noise,
            num_blocks, start)

    def _denoise(self, ctx_kv, cache, noise_blk, rng, start, hint):
        if self.mesh is not None:
            from self_forcing_tpu.parallel import tensor as tpmod
            return tpmod.denoise_block_tp(
                self.params, self.cfg, self.scheduler, self.rope, ctx_kv,
                cache, noise_blk, rng, self.denoising_step_list, start,
                self.mesh, axis=self.tp_axis, static_kv_hi=hint)
        return denoise_block(self.params, self.cfg, self.scheduler,
                             self.rope, ctx_kv, cache, noise_blk, rng,
                             self.denoising_step_list, start,
                             static_kv_hi=hint)

    def _refresh(self, ctx_kv, cache, blk, rng, start, hint):
        if self.mesh is not None:
            from self_forcing_tpu.parallel import tensor as tpmod
            return tpmod.refresh_block_tp(
                self.params, self.cfg, self.rope, ctx_kv, cache, blk, rng,
                self.context_noise, start, self.mesh, axis=self.tp_axis,
                static_kv_hi=hint)
        return refresh_block(self.params, self.cfg, self.rope, ctx_kv,
                             cache, blk, rng, self.context_noise, start,
                             static_kv_hi=hint)

    # --------------------------------------------------------- inference
    def inference(self, noise: jax.Array,
                  text_prompts: Optional[List[str]] = None,
                  context: Optional[jax.Array] = None,
                  initial_latent: Optional[jax.Array] = None,
                  return_latents: bool = False,
                  rng: Optional[jax.Array] = None,
                  profile: bool = False):
        """noise: [B, F, C, H, W] -> video [B, F_pix, 3, H*8, W*8] in [0,1].

        Matches reference semantics (pipeline/causal_inference.py:47-276)
        including i2v priming and the cache-refresh pass.  ``profile=True``
        prints a phase breakdown (reference :98-110,258-271 CUDA events ->
        block_until_ready timers here).
        """
        import time
        B, F, C, H, W = noise.shape
        nb = self.num_frame_per_block
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        # noise H/W are latent dims; frame_seqlen after (1,2,2) patching:
        fs = (H // self.cfg.patch_size[1]) * (W // self.cfg.patch_size[2])

        if context is None:
            context = self.encode_text(text_prompts)
        assert self.mesh is None or B == 1, \
            "tensor-parallel sampling requires batch 1 (parallel/tensor.py)"

        t0 = time.perf_counter()
        ctx_kv = self._precompute_context(context)

        num_input_frames = (initial_latent.shape[1]
                            if initial_latent is not None else 0)
        total_frames = F + num_input_frames
        cache = self._init_cache(B, fs, max(total_frames, 21), noise.dtype,
                                 slack=False)

        start = jnp.int32(0)
        outputs = []
        if initial_latent is not None:
            outputs.append(initial_latent)
            if self.cfg.independent_first_frame:
                cache = self._prime(ctx_kv, cache, initial_latent[:, :1],
                                    start)
                start = start + 1
                rest = initial_latent[:, 1:]
            else:
                rest = initial_latent
            nf = rest.shape[1]
            # reference asserts divisibility (causal_inference.py:154);
            # silently dropping frames would prime a shifted cache
            assert nf % nb == 0, (nf, nb)
            for b in range(nf // nb):
                cache = self._prime(ctx_kv, cache,
                                    rest[:, b * nb:(b + 1) * nb], start)
                start = start + nb
        jax.block_until_ready(cache.k)
        t_init = time.perf_counter() - t0

        # first independent frame (no initial latent)
        t0 = time.perf_counter()
        gen_noise = noise
        if self.cfg.independent_first_frame and initial_latent is None:
            rng, k = jax.random.split(rng)
            first, cache = self._generate(ctx_kv, cache, noise[:, :1], k,
                                          1, start)
            outputs.append(first)
            start = start + 1
            gen_noise = noise[:, 1:]

        num_blocks = gen_noise.shape[1] // nb
        rng, k = jax.random.split(rng)
        out, cache = self._generate(ctx_kv, cache, gen_noise, k,
                                    num_blocks, start)
        outputs.append(out)
        latents = jnp.concatenate(outputs, axis=1)
        jax.block_until_ready(latents)
        t_diffusion = time.perf_counter() - t0

        self._cache = cache
        if self.vae_params is None:
            video = None
        else:
            t0 = time.perf_counter()
            # [B, F, C, h, w] -> [B, F, h, w, C] for the VAE
            lat = latents.transpose(0, 1, 3, 4, 2)
            video = vae_mod.decode(self.vae_params, self.vae_cfg, lat)
            video = (video * 0.5 + 0.5)
            # [B, T, H, W, 3] -> [B, T, 3, H, W] (reference output layout)
            video = jnp.clip(video, 0, 1).transpose(0, 1, 4, 2, 3)
            jax.block_until_ready(video)
            t_vae = time.perf_counter() - t0

        if profile:
            total = t_init + t_diffusion + (t_vae if video is not None else 0)
            print("Profiling results:")
            print(f"  - Initialization/caching time: {t_init*1e3:.2f} ms")
            print(f"  - Diffusion generation time: {t_diffusion*1e3:.2f} ms")
            if video is not None:
                print(f"  - VAE decoding time: {t_vae*1e3:.2f} ms")
            print(f"  - Total time: {total*1e3:.2f} ms")

        if return_latents:
            return video, latents
        return video

    # --------------------------------------------------------- streaming
    def stream(self, noise: jax.Array, context: jax.Array,
               rng: Optional[jax.Array] = None):
        """Yield denoised latent chunks one block at a time — the serving
        path (demo.py:331-440).  The caller decodes each chunk while the
        next is being generated (async dispatch).  The first chunk is
        [B, 1, ...] for independent-first-frame models, [B, nb, ...]
        otherwise."""
        B, F, C, H, W = noise.shape
        nb = self.num_frame_per_block
        fs = (H // self.cfg.patch_size[1]) * (W // self.cfg.patch_size[2])
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        assert self.mesh is None or B == 1, \
            "tensor-parallel sampling requires batch 1 (parallel/tensor.py)"

        ctx_kv = self._precompute_context(context)
        cache = self._init_cache(B, fs, max(F, 21), noise.dtype)
        # the per-block calls donate the cache: the buffers self._cache
        # aliased are dead from here on, so invalidate the reuse signature
        # until the final cache is handed back at exhaustion (an abandoned
        # generator must not leave self._cache pointing at donated arrays)
        self._cache = None
        self._cache_sig = None
        start = jnp.int32(0)
        blocks = [(b * nb, nb) for b in range(F // nb)]
        if self.cfg.independent_first_frame:
            assert (F - 1) % nb == 0, (F, nb)
            blocks = [(0, 1)] + [(1 + b * nb, nb)
                                 for b in range((F - 1) // nb)]
        else:
            assert F % nb == 0, (F, nb)
        # windowed: host-side buffer-fill tracker — the block cadence is
        # static, so compaction (dit.compact_cache, its own donated
        # program) runs exactly when the next block would overflow; the
        # per-block jits then carry no compaction cond at all
        windowed = self.cfg.local_attn_size != -1
        if windowed:
            content = 0
        for i, (lo, n) in enumerate(blocks):
            rng, k1 = jax.random.split(rng)
            # python loop => the cached-token count is static: size the
            # attention kernel grid to the live window (global path only)
            hint = lo * fs if self.cfg.local_attn_size == -1 else None
            if windowed:
                buf_tok, post = dit.windowed_compaction_schedule(
                    self.cfg, fs, n * fs)
                if content + n * fs > buf_tok:
                    cache = dit.compact_cache(self.cfg, cache, n * fs)
                    content = post
                content += n * fs
            blk, cache = self._denoise(ctx_kv, cache, noise[:, lo:lo + n],
                                       k1, start, hint)
            # hand the chunk to the caller BEFORE the cache refresh:
            # the decode dispatch precedes the refresh program, cutting
            # time-to-first-chunk; the refresh is skipped entirely on
            # the last block (demo.py:396-404).
            yield blk
            if i < len(blocks) - 1:
                rng, k2 = jax.random.split(rng)
                cache = self._refresh(ctx_kv, cache, blk, k2, start, hint)
            start = start + n
        self._cache = cache
        self._cache_sig = (B, fs, max(F, 21), noise.dtype,
                           -1 if self.cfg.local_attn_size == -1
                           else self.cfg.buffer_frames)
