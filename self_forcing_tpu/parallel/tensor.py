"""Megatron-style tensor parallelism for the Wan DiT over an ICI mesh axis.

The reference has no tensor parallelism (SURVEY.md §2.8: TP/PP/EP
"absent"); it is the TPU-native enabler for the 14B chunk-wise AR stretch
config (BASELINE.json): Wan-14B bf16 is ~28 GB of weights — it cannot fit a
single 16 GB v5e chip, but TP=4 over one ICI-connected slice leaves
~7 GB/chip for weights plus the sharded KV cache.

Design: ``shard_map`` over a ``('tp',)`` axis, where every device runs the
UNMODIFIED single-chip forward (models/wan/dit.py) on a *local* config with
``num_heads/ffn_dim`` divided by tp and ``cfg.tp_axis`` set.  The block
code then inserts the only collectives TP needs:

- psum after the row-sharded projections (attention ``o``, ffn ``fc2``) —
  ``dit._out_linear``;
- psum of the q/k RMS-norm sum-of-squares (the reference normalizes over
  the FULL packed head dim before the head split — model.py:70-86) —
  ``dit._qk_rms_norm``.

Everything that reduces over tokens or model dim on replicated activations
(layer norms, modulation, patch embed, head) is computed identically on
every device; column-sharded projections (q/k/v, ffn ``fc1``) and the
attention itself are purely local (heads never cross devices).  The KV
cache lives permanently sharded over heads — it is only ever produced and
consumed by shard_map with the same specs, so no resharding ever happens.

All collectives are [B, L, dim]-sized psums riding ICI — 3 per layer —
exactly the Megatron-TP schedule XLA would derive from GSPMD sharding, but
stated explicitly so the Pallas attention kernels (which GSPMD cannot
partition) run on local shards.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables

AXIS = "tp"


def tp_mesh(tp: int | None = None, devices=None, axis: str = AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    tp = tp if tp is not None else len(devices)
    return Mesh(np.asarray(devices[:tp]), (axis,))


def tp_local_config(cfg: WanConfig, tp: int, axis: str = AXIS) -> WanConfig:
    """Per-device view of the model: tp-th of the heads and ffn columns."""
    assert cfg.num_heads % tp == 0, (cfg.num_heads, tp)
    assert cfg.ffn_dim % tp == 0, (cfg.ffn_dim, tp)
    return dataclasses.replace(
        cfg, num_heads=cfg.num_heads // tp, ffn_dim=cfg.ffn_dim // tp,
        head_dim_override=cfg.head_dim, tp_axis=axis)


def _block_leaf_spec(path: tuple[str, ...], axis: str) -> P:
    """PartitionSpec for one leaf under params['blocks'] (leading L axis
    from the layer stack)."""
    parent, leaf = path[-2], path[-1]
    col = parent in ("q", "k", "v", "k_img", "v_img", "fc1")
    row = parent in ("o", "fc2")
    if col:  # output columns = this device's heads / ffn slice
        return {"w": P(None, None, axis), "b": P(None, axis),
                "lora_A": P(None), "lora_B": P(None, None, axis),
                }.get(leaf, P(None))
    if row:  # input rows sharded; bias and lora_B replicated (psum'd
        # partials in dit._out_linear)
        return {"w": P(None, axis, None),
                "lora_A": P(None, axis, None)}.get(leaf, P(None))
    if parent in ("norm_q", "norm_k", "norm_k_img"):
        return P(None, axis)
    # modulation / norm3 / lora_scale: replicated
    return P(None)


def tp_param_specs(params: dict, axis: str = AXIS):
    """PartitionSpec pytree for the DiT params under tensor parallelism.

    Raises on quantized params: the quantized leaves ('w_q'/'w_qa'/'w_f8')
    take code paths (quantized_linear / quantized_ffn) that bypass the TP psums
    in dit._out_linear — sharding them would produce silently wrong
    activations.  Quantize-after-TP is a future extension; bf16 weights
    are the deployment path TP exists for (14B does not fit one chip).
    """
    def spec(path, _x):
        keys = tuple(getattr(p, "key", getattr(p, "name", None))
                     for p in path)
        if any(k in ("w_q", "w_qa", "w_f8", "w_scale") for k in keys):
            raise ValueError(
                f"tensor parallelism does not support quantized params "
                f"(leaf {'/'.join(map(str, keys))}); quantize is a "
                f"single-chip speed toggle — see tp_param_specs docstring")
        if "blocks" in keys:
            return _block_leaf_spec(keys, axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(params: dict, mesh: Mesh, axis: str = AXIS):
    specs = tp_param_specs(params, axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def _ctx_specs(ctx_kv: dict, axis: str = AXIS):
    # k_txt/v_txt (and k_img/v_img): [L, B, Lc, N, Dh] — heads on axis 3
    return {k: P(None, None, None, axis) for k in ctx_kv}


def _cache_specs(axis: str = AXIS) -> dit.KVCache:
    # folded cache [L, B*N, S, D]: heads on axis 1 (requires B == 1 so the
    # global fold b*N+n is head-contiguous per device)
    return dit.KVCache(k=P(None, axis), v=P(None, axis),
                       global_end=P(), local_end=P(), kmax=P())


def init_kv_cache_tp(cfg: WanConfig, mesh: Mesh, batch_size: int,
                     frame_seqlen: int, frames: int, dtype=jnp.bfloat16,
                     axis: str = AXIS) -> dit.KVCache:
    """Zero cache laid out sharded over heads on the tp axis."""
    assert batch_size == 1, "TP inference shards the folded B*N axis: B==1"
    cache = dit.init_kv_cache(cfg, batch_size, frame_seqlen, frames, dtype)
    specs = _cache_specs(axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache, specs)


def precompute_context_tp(params: dict, cfg: WanConfig, context: jax.Array,
                          mesh: Mesh, clip_fea: Optional[jax.Array] = None,
                          axis: str = AXIS) -> dict:
    """Per-prompt cross-attention K/V, head-sharded over the tp axis."""
    tp = mesh.shape[axis]
    cfg_l = tp_local_config(cfg, tp, axis)
    has_img = clip_fea is not None and cfg.model_type == "i2v"
    out_keys = (["k_txt", "v_txt"] + (["k_img", "v_img"] if has_img else []))
    out_specs = {k: P(None, None, None, axis) for k in out_keys}

    if has_img:
        fn = lambda p, c, cf: dit.precompute_context(p, cfg_l, c, cf)
        in_specs = (tp_param_specs(params, axis), P(), P())
        args = (params, context, clip_fea)
    else:
        fn = lambda p, c: dit.precompute_context(p, cfg_l, c)
        in_specs = (tp_param_specs(params, axis), P())
        args = (params, context)
    return shard_map(fn, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)(*args)


def forward_inference_tp(params: dict, cfg: WanConfig, x: jax.Array,
                         t: jax.Array, ctx_kv: dict, cache: dit.KVCache,
                         start_frame: jax.Array, rope: RopeTables,
                         mesh: Mesh, axis: str = AXIS,
                         y: Optional[jax.Array] = None,
                         cache_start_frame=None,
                         static_kv_hi: Optional[int] = None,
                         write_cache: bool = True):
    """KV-cached forward, tensor-parallel over ``axis``.

    Numerically matches :func:`dit.forward_inference` (up to psum
    reassociation); the cache argument/result stay head-sharded, the
    tokens replicated.  B must be 1 (head-contiguous fold).
    """
    assert x.shape[0] == 1, "TP inference requires batch 1"
    tp = mesh.shape[axis]
    cfg_l = tp_local_config(cfg, tp, axis)
    cspec = _cache_specs(axis)
    if y is not None:  # i2v channel concat happens on replicated x
        x = jnp.concatenate([x, y], axis=2)
        y = None
    if cache_start_frame is None:
        cache_start_frame = start_frame

    def fn(p, x_, t_, ckv, cache_, s_, cs_):
        out, new_cache = dit.forward_inference(
            p, cfg_l, x_, t_, ckv, cache_, s_, rope, y=None,
            cache_start_frame=cs_, static_kv_hi=static_kv_hi,
            write_cache=write_cache)
        # kmax is a per-device (local heads) bound; pmax makes it a valid
        # replicated global bound so the output spec can be P()
        new_cache = dataclasses.replace(
            new_cache, kmax=jax.lax.pmax(new_cache.kmax, axis))
        return out, new_cache

    in_specs = (tp_param_specs(params, axis), P(), P(),
                _ctx_specs(ctx_kv, axis), cspec, P(), P())
    fi = shard_map(fn, mesh=mesh, in_specs=in_specs,
                   out_specs=(P(), cspec), check_vma=False)
    return fi(params, x, t, ctx_kv, cache,
              jnp.asarray(start_frame, jnp.int32),
              jnp.asarray(cache_start_frame, jnp.int32))


def forward_train_tp(params: dict, cfg: WanConfig, x: jax.Array,
                     t: jax.Array, context: jax.Array, mask,
                     rope: RopeTables, mesh: Mesh, axis: str = AXIS,
                     **kw):
    """No-cache forward (bidirectional teacher / causal training),
    tensor-parallel over ``axis`` — every array argument replicated, the
    params head/ffn-sharded.  Gradients flow through shard_map (psum
    transposes to identity on replicated outputs)."""
    tp = mesh.shape[axis]
    cfg_l = tp_local_config(cfg, tp, axis)

    def fn(p, x_, t_, c_):
        return dit.forward_train(p, cfg_l, x_, t_, c_, mask, rope, **kw)

    fi = shard_map(fn, mesh=mesh,
                   in_specs=(tp_param_specs(params, axis), P(), P(), P()),
                   out_specs=P(), check_vma=False)
    return fi(params, x, t, context)


# ---------------------------------------------------------------------
# Pipeline-level TP: the two ops the streaming AR loop dispatches per
# block (pipelines/causal_inference.py denoise_block / refresh_block),
# shard_map'd whole so the scheduler math runs replicated between the
# tensor-parallel DiT forwards.  This is the Wan-14B chunk-wise AR
# driver: the same python block loop as bench.py / the demo server, with
# these two in place of the single-chip versions.
# ---------------------------------------------------------------------

def denoise_block_tp(params: dict, cfg: WanConfig, scheduler,
                     rope: RopeTables, ctx_kv: dict, cache: dit.KVCache,
                     noise_blk: jax.Array, rng: jax.Array,
                     steps: tuple[float, ...], start_frame: jax.Array,
                     mesh: Mesh, axis: str = AXIS,
                     static_kv_hi: Optional[int] = None):
    """Tensor-parallel 4-step block denoise (matches denoise_block)."""
    from self_forcing_tpu.pipelines.causal_inference import denoise_block
    tp = mesh.shape[axis]
    cfg_l = tp_local_config(cfg, tp, axis)
    cspec = _cache_specs(axis)

    def fn(p, ckv, cache_, nz, r, s):
        out, c = denoise_block(p, cfg_l, scheduler, rope, ckv, cache_, nz,
                               r, steps, s, static_kv_hi=static_kv_hi)
        return out, dataclasses.replace(c, kmax=jax.lax.pmax(c.kmax, axis))

    fi = shard_map(fn, mesh=mesh,
                   in_specs=(tp_param_specs(params, axis),
                             _ctx_specs(ctx_kv, axis), cspec, P(), P(),
                             P()),
                   out_specs=(P(), cspec), check_vma=False)
    return fi(params, ctx_kv, cache, noise_blk, rng,
              jnp.asarray(start_frame, jnp.int32))


def refresh_block_tp(params: dict, cfg: WanConfig, rope: RopeTables,
                     ctx_kv: dict, cache: dit.KVCache, x0: jax.Array,
                     rng: jax.Array, context_noise: float,
                     start_frame: jax.Array, mesh: Mesh, axis: str = AXIS,
                     static_kv_hi: Optional[int] = None) -> dit.KVCache:
    """Tensor-parallel cache-refresh pass (matches refresh_block)."""
    from self_forcing_tpu.pipelines.causal_inference import refresh_block
    tp = mesh.shape[axis]
    cfg_l = tp_local_config(cfg, tp, axis)
    cspec = _cache_specs(axis)

    def fn(p, ckv, cache_, x0_, r, s):
        c = refresh_block(p, cfg_l, rope, ckv, cache_, x0_, r,
                          context_noise, s, static_kv_hi=static_kv_hi)
        return dataclasses.replace(c, kmax=jax.lax.pmax(c.kmax, axis))

    fi = shard_map(fn, mesh=mesh,
                   in_specs=(tp_param_specs(params, axis),
                             _ctx_specs(ctx_kv, axis), cspec, P(), P(),
                             P()),
                   out_specs=cspec, check_vma=False)
    return fi(params, ctx_kv, cache, x0, rng,
              jnp.asarray(start_frame, jnp.int32))


def prime_block_tp(params: dict, cfg: WanConfig, rope: RopeTables,
                   ctx_kv: dict, cache: dit.KVCache, latents: jax.Array,
                   start_frame: jax.Array, mesh: Mesh,
                   axis: str = AXIS) -> dit.KVCache:
    """Tensor-parallel context priming (matches prime_block — i2v /
    video-extension clean-latent writes, causal_inference.py:136-169)."""
    from self_forcing_tpu.pipelines.causal_inference import prime_block
    tp = mesh.shape[axis]
    cfg_l = tp_local_config(cfg, tp, axis)
    cspec = _cache_specs(axis)

    def fn(p, ckv, cache_, lat, s):
        c = prime_block(p, cfg_l, rope, ckv, cache_, lat, s)
        return dataclasses.replace(c, kmax=jax.lax.pmax(c.kmax, axis))

    fi = shard_map(fn, mesh=mesh,
                   in_specs=(tp_param_specs(params, axis),
                             _ctx_specs(ctx_kv, axis), cspec, P(), P()),
                   out_specs=cspec, check_vma=False)
    return fi(params, ctx_kv, cache, latents,
              jnp.asarray(start_frame, jnp.int32))


def generate_blocks_tp(params: dict, cfg: WanConfig, scheduler,
                       rope: RopeTables, ctx_kv: dict, cache: dit.KVCache,
                       noise: jax.Array, rng: jax.Array,
                       steps: tuple[float, ...], context_noise: float,
                       num_blocks: int, start_frame0: jax.Array,
                       mesh: Mesh, axis: str = AXIS):
    """Tensor-parallel whole-video block scan (matches generate_blocks:
    one jitted lax.scan over blocks, denoise + cache-refresh per block).

    The entire scan runs inside one shard_map: per-shard kmax is a valid
    bound for that shard's own heads at every step, so the pmax that
    makes it a replicated global bound only happens once at the end (for
    the P() out-spec), not per block.  RNG keys are replicated, so every
    shard draws identical re-noising eps — bit-identical control flow to
    the single-chip scan."""
    from self_forcing_tpu.pipelines.causal_inference import generate_blocks
    tp = mesh.shape[axis]
    cfg_l = tp_local_config(cfg, tp, axis)
    cspec = _cache_specs(axis)

    def fn(p, ckv, cache_, nz, r, s):
        out, c = generate_blocks(p, cfg_l, scheduler, rope, ckv, cache_,
                                 nz, r, steps, context_noise, num_blocks, s)
        return out, dataclasses.replace(c, kmax=jax.lax.pmax(c.kmax, axis))

    fi = shard_map(fn, mesh=mesh,
                   in_specs=(tp_param_specs(params, axis),
                             _ctx_specs(ctx_kv, axis), cspec, P(), P(),
                             P()),
                   out_specs=(P(), cspec), check_vma=False)
    return fi(params, ctx_kv, cache, noise, rng,
              jnp.asarray(start_frame0, jnp.int32))
