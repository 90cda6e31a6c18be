"""Sequence/context parallelism — ring attention over the ICI mesh.

TPU-native replacement for the reference's xDiT USP path
(wan/distributed/xdit_context_parallel.py: tokens chunked across SP ranks
:131-133, per-rank RoPE slice :52-57, xFuserLongContextAttention :179-184,
gather after head :142), used by the bidirectional 14B teacher for long
sequences (SURVEY.md §5.7.2).

Design: shard the *frame* axis over the 'sp' mesh axis with shard_map.
Inside the shard:
- patchify/AdaLN/FFN are local (per-frame ops);
- self-attention runs as a **ring**: each step attends local Q against the
  resident KV shard, then rotates KV to the neighbor with
  ``jax.lax.ppermute`` — log-free online-softmax accumulation, overlapping
  compute with ICI transfers;
- cross-attention is local (512 text tokens replicated);
- outputs stay frame-sharded; shard_map's out_spec reassembles.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   axis_name: str, scale: Optional[float] = None
                   ) -> jax.Array:
    """Bidirectional ring attention inside shard_map.

    q/k/v: [B, L_loc, N, D] local shards; full attention over the global
    sequence via ``sp`` ppermute rotations.
    """
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    sp = jax.lax.psum(1, axis_name)

    qf = jnp.swapaxes(q, 1, 2).astype(jnp.float32) * scale  # [B,N,Lq,D]

    def step(carry, _):
        m, l, o, kc, vc = carry
        kf = jnp.swapaxes(kc, 1, 2).astype(jnp.float32)
        vf = jnp.swapaxes(vc, 1, 2).astype(jnp.float32)
        s = jnp.einsum("bnqd,bnkd->bnqk", qf, kf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        o_new = o * corr + jnp.einsum("bnqk,bnkd->bnqd", p, vf)
        # rotate KV to the next rank on the ring
        perm = [(i, (i + 1) % sp) for i in range(sp)]
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (m_new, l_new, o_new, kc, vc), None

    B, Lq, N, D = q.shape
    # derive carries from qf so they inherit its varying-axis type
    # (shard_map scan carries must match exactly)
    m0 = qf[..., :1] * 0.0 - 1e30
    l0 = qf[..., :1] * 0.0
    o0 = qf * 0.0
    (m, l, o, _, _), _ = jax.lax.scan(step, (m0, l0, o0, k, v), None,
                                      length=sp)
    out = o / jnp.maximum(l, 1e-30)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


def _block_sp(bp, cfg: WanConfig, x, e0, cos, sin, ctx_kv_layer,
              frame_seqlen: int, axis_name: str):
    """One transformer block with ring self-attention (sequence-sharded
    tokens); mirrors dit._block_train."""
    from self_forcing_tpu.models.wan.dit import (_cross_attention, _gate,
                                                 _modulate, _qkv,
                                                 _rope_half, gelu_tanh,
                                                 layer_norm, linear)
    mod = bp["modulation"].astype(jnp.float32)[:, None]
    e = (mod + e0.astype(jnp.float32)).astype(x.dtype)
    e_shift, e_scale, e_gate = e[:, :, 0:1], e[:, :, 1:2], e[:, :, 2:3]
    f_shift, f_scale, f_gate = e[:, :, 3:4], e[:, :, 4:5], e[:, :, 5:6]

    xn = _modulate(layer_norm(x, cfg.eps), e_shift, e_scale, frame_seqlen)
    q, k, v = _qkv(bp["self_attn"], cfg, xn)
    q = _rope_half(q, cos, sin)
    k = _rope_half(k, cos, sin)
    attn = ring_attention(q, k, v, axis_name)
    B, L = attn.shape[:2]
    y = linear(bp["self_attn"]["o"], attn.reshape(B, L, cfg.dim))
    x = x + _gate(y, e_gate, frame_seqlen)

    if "norm3" in bp:
        xc = layer_norm(x, cfg.eps, bp["norm3"]["w"], bp["norm3"]["b"])
    else:
        xc = x
    x = x + _cross_attention(bp, cfg, xc, ctx_kv_layer)

    xn = _modulate(layer_norm(x, cfg.eps), f_shift, f_scale, frame_seqlen)
    y = linear(bp["ffn"]["fc2"], gelu_tanh(linear(bp["ffn"]["fc1"], xn)))
    return x + _gate(y, f_gate, frame_seqlen)


def forward_train_sp(params, cfg: WanConfig, x: jax.Array, t: jax.Array,
                     context: jax.Array, rope: RopeTables, mesh: Mesh,
                     axis_name: str = "sp") -> jax.Array:
    """Sequence-parallel bidirectional forward (usp_dit_forward,
    xdit_context_parallel.py:66-146): frames sharded over the 'sp' axis.

    x: [B, F, C, H, W] with F % sp == 0.  Returns the full flow prediction
    (frames reassembled by shard_map).
    """
    from jax import shard_map

    B, F, C, H, W = x.shape
    sp = mesh.shape[axis_name]
    assert F % sp == 0, (F, sp)
    h, w = H // cfg.patch_size[1], W // cfg.patch_size[2]
    frame_seqlen = h * w

    def shard_fn(params, x_loc, t_loc, context):
        from self_forcing_tpu.models.wan.dit import (head_forward, patchify,
                                                     precompute_context,
                                                     time_embed, unpatchify)
        idx = jax.lax.axis_index(axis_name)
        F_loc = x_loc.shape[1]
        tokens, grid = patchify(params, cfg, x_loc)
        e, e0 = time_embed(params, cfg, t_loc, tokens.dtype)
        # per-rank RoPE slice (xdit_context_parallel.py:52-57)
        cos, sin = rope.angles_for_grid(F_loc, h, w, idx * F_loc)
        ctx_kv = precompute_context(params, cfg, context)

        def body(tok, xs):
            bp, kt, vt = xs
            tok = _block_sp(bp, cfg, tok, e0, cos, sin,
                            {"k_txt": kt, "v_txt": vt}, frame_seqlen,
                            axis_name)
            return tok, None

        tokens, _ = jax.lax.scan(
            body, tokens,
            (params["blocks"], ctx_kv["k_txt"], ctx_kv["v_txt"]))
        out_tokens = head_forward(params, cfg, tokens, e, frame_seqlen)
        return unpatchify(cfg, out_tokens, grid)

    pspec = P(None, axis_name)  # shard frame dim
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), pspec, pspec, P()),
        out_specs=pspec,
        )
    return fn(params, x, t, context)
