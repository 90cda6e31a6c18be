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
                   axis_name: str, scale: Optional[float] = None,
                   kv_valid: Optional[int] = None,
                   kv_chunk: int = 1024) -> jax.Array:
    """Bidirectional ring attention inside shard_map.

    q/k/v: [B, L_loc, N, D] local shards; full attention over the global
    sequence via ``sp - 1`` ppermute rotations (a python loop — sp is
    static — so no rotation is issued after the final accumulate).

    ``kv_valid``: optional global token count — KV columns at global index
    >= kv_valid are masked out (sequence padding to an sp multiple; the
    reference likewise rounds seq_len up to the sp world size,
    wan/text2video.py:160-162).

    ``kv_chunk``: each ring step accumulates its resident KV in chunks of
    ~this many tokens (online softmax — exact up to fp reassociation).
    Without it the step materializes the full [B, N, L_loc, L_loc] f32
    score matrix: 3.3 GB per buffered step at the 14B teacher's
    21-frame/sp=4 geometry — measured as the largest allocation of the
    DMD-step AOT compile (parallel/aot.py); chunked it is ~0.6 GB
    transient.
    """
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    sp = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    qf = jnp.swapaxes(q, 1, 2).astype(jnp.float32) * scale  # [B,N,Lq,D]
    B, Lq, N, D = q.shape
    m = qf[..., :1] * 0.0 - 1e30
    l = qf[..., :1] * 0.0
    o = qf * 0.0
    kc, vc = k, v
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    Lk = k.shape[1]
    # cap the per-chunk f32 score buffer (~double-buffered by XLA across
    # scan steps) at ~0.75 GB: at the 14B teacher's 40-head/9360-token
    # shards an uncapped 2048-chunk costs 2 x 2.6 GB of HLO temps
    cap = max(1, int((768 * 2 ** 20) // max(1, B * N * Lq * 4)))
    cw = max((c for c in range(1, min(kv_chunk, cap, Lk) + 1)
              if Lk % c == 0), default=Lk)
    nc = Lk // cw

    for step in range(sp):
        src = (idx - step) % sp  # after `step` rotations device idx
        # holds the KV that originated on device (idx - step) mod sp

        def chunk_body(carry, xs, src=src):
            m, l, o = carry
            kci, vci, ci = xs                       # [B, cw, N, D]
            kf = jnp.swapaxes(kci, 1, 2).astype(jnp.float32)
            vf = jnp.swapaxes(vci, 1, 2).astype(jnp.float32)
            s = jnp.einsum("bnqd,bnkd->bnqk", qf, kf)
            if kv_valid is not None:
                col = src * Lk + ci * cw + jnp.arange(cw)
                s = jnp.where(col[None, None, None, :] < kv_valid, s,
                              -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            o = o * corr + jnp.einsum("bnqk,bnkd->bnqd", p, vf)
            return (m_new, l, o), None

        if nc == 1:
            (m, l, o), _ = chunk_body((m, l, o), (kc, vc, jnp.int32(0)))
        else:
            xs = (kc.reshape(B, nc, cw, N, D).swapaxes(0, 1),
                  vc.reshape(B, nc, cw, N, D).swapaxes(0, 1),
                  jnp.arange(nc, dtype=jnp.int32))
            (m, l, o), _ = jax.lax.scan(chunk_body, (m, l, o), xs)
        if step < sp - 1:  # the last rotation's result was never read
            kc = jax.lax.ppermute(kc, axis_name, perm)
            vc = jax.lax.ppermute(vc, axis_name, perm)

    out = o / jnp.maximum(l, 1e-30)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


def _block_sp(bp, cfg: WanConfig, x, e0, cos, sin, ctx_kv_layer,
              frame_seqlen: int, axis_name: str,
              kv_valid: Optional[int] = None):
    """One transformer block with ring self-attention: dit._block_train
    with the attention swapped via its ``attn_fn`` hook (no forked block
    math to keep in sync)."""
    return dit._block_train(
        bp, cfg, x, e0, cos, sin, None, ctx_kv_layer, frame_seqlen,
        attn_fn=lambda q, k, v: ring_attention(q, k, v, axis_name,
                                               kv_valid=kv_valid))


def _sp_gather(tree, specs, axis_name: str):
    """All-gather a param (sub)tree's sp-sharded dims back to full size
    inside the sp-manual shard_map (the ZeRO-3-over-sp schedule: params
    live sharded over BOTH fsdp and sp; fsdp stays GSPMD-auto, the sp
    factor is re-gathered here — per layer when called from the scan
    body, so only one layer's full weights ever exist at once)."""
    def one(x, sp):
        for dim, entry in enumerate(sp or ()):
            if entry == axis_name:
                x = jax.lax.all_gather(x, axis_name, axis=dim, tiled=True)
        return x

    return jax.tree_util.tree_map(
        one, tree, specs,
        is_leaf=lambda t: isinstance(t, jax.sharding.PartitionSpec))


def forward_train_sp(params, cfg: WanConfig, x: jax.Array, t: jax.Array,
                     context: jax.Array, rope: RopeTables, mesh: Mesh,
                     axis_name: str = "sp",
                     y: Optional[jax.Array] = None,
                     clip_fea: Optional[jax.Array] = None,
                     param_specs=None) -> jax.Array:
    """Sequence-parallel bidirectional forward (usp_dit_forward,
    xdit_context_parallel.py:66-146): frames sharded over the 'sp' axis.

    x: [B, F, C, H, W] with F % sp == 0.  Returns the full flow prediction
    (frames reassembled by shard_map).

    I2V conditioning (the reference's WanI2V runs the same USP patch,
    wan/image2video.py + xdit_context_parallel.py): ``y`` [B, F, Cy, H, W]
    is channel-concatenated per frame (local to each shard) and
    ``clip_fea`` [B, 257, clip_dim] is replicated — its 257 image tokens
    feed the separate k_img/v_img cross-attention, which is local like the
    text cross-attention.

    ``param_specs``: optional FULL PartitionSpec tree of the params'
    fsdp x sp layout (parallel.mesh.combined_fsdp_specs).  Enables
    ZERO-3-OVER-SP teacher params: a 14B teacher sharded over
    fsdp x sp = all devices holds 28/(f*s) GB per chip; each scan step
    all-gathers ONE layer's weights over sp (the per-layer all-gather
    FSDP does by hand, here over the manual axis) — this is what fits
    the 14B teacher on a v5e-8 (fsdp=2 x sp=4), where fsdp-only
    sharding leaves 14 GB/device (parallel/aot.py).  The sp component
    feeds shard_map's in_specs; the remaining auto component is pinned
    with sharding constraints inside (without them GSPMD replicates the
    whole weight stack over fsdp at the shard_map boundary — 3.5 GB of
    HLO temps at the 14B teacher, buffer-assignment measured).
    """
    from jax import shard_map

    from self_forcing_tpu.parallel.mesh import spec_component

    if y is not None:
        # channel concat (model.py:679-680) is per-frame, so it commutes
        # with the frame sharding; do it before the pad/shard
        x = jnp.concatenate([x, y.astype(x.dtype)], axis=2)
    B, F, C, H, W = x.shape
    sp = mesh.shape[axis_name]
    h, w = H // cfg.patch_size[1], W // cfg.patch_size[2]
    frame_seqlen = h * w
    # pad frames to an sp multiple (the reference rounds seq_len up to the
    # sp world size, wan/text2video.py:160-162); padded KV columns are
    # masked out of the ring attention and the padded frames sliced off
    F_pad = -(-F // sp) * sp
    if F_pad != F:
        x = jnp.concatenate(
            [x, jnp.zeros((B, F_pad - F, C, H, W), x.dtype)], axis=1)
        t = jnp.concatenate(
            [t, jnp.broadcast_to(t[:, -1:], (B, F_pad - F))], axis=1)
    kv_valid = F * frame_seqlen if F_pad != F else None

    if param_specs is not None:
        sp_specs = spec_component(param_specs, axis_name)
        # the auto (non-sp) component, as seen INSIDE the manual region
        def _auto_entry(entry):
            if entry is None:
                return None
            axes = tuple(a for a in (entry if isinstance(entry, tuple)
                                     else (entry,)) if a != axis_name)
            return axes if len(axes) > 1 else (axes[0] if axes else None)

        auto_specs = jax.tree_util.tree_map(
            lambda sp: P(*[_auto_entry(e) for e in sp]), param_specs,
            is_leaf=lambda t: isinstance(t, P))
        # no 'sp' on the stacked-layer dim: the per-layer gather below
        # drops dim 0 of every blocks leaf
        for sp in jax.tree_util.tree_leaves(
                sp_specs["blocks"], is_leaf=lambda t: isinstance(t, P)):
            assert not (len(sp) > 0 and sp[0] == axis_name), sp
        blocks_layer_specs = jax.tree_util.tree_map(
            lambda sp: P(*tuple(sp)[1:]), sp_specs["blocks"],
            is_leaf=lambda t: isinstance(t, P))

    def shard_fn(params, x_loc, t_loc, context, *clip_args):
        from self_forcing_tpu.models.wan import dit as _dit
        from self_forcing_tpu.models.wan.dit import (head_forward, patchify,
                                                     precompute_context,
                                                     time_embed, unpatchify)
        gather_mode = param_specs is not None
        if gather_mode:
            # pin the auto-axes sharding (see docstring: GSPMD otherwise
            # replicates the weight stack over fsdp at the boundary)
            params = jax.tree_util.tree_map(
                lambda a, sp: jax.lax.with_sharding_constraint(a, sp),
                params, auto_specs,
                is_leaf=lambda t: isinstance(t, P))
            # ZeRO-3-over-sp: re-gather everything OUTSIDE the layer
            # stack up front (embeddings/head — small), the layer stack
            # per scan step below
            nb_params = {k: v for k, v in params.items() if k != "blocks"}
            nb_specs = {k: v for k, v in sp_specs.items()
                        if k != "blocks"}
            params = dict(_sp_gather(nb_params, nb_specs, axis_name),
                          blocks=params["blocks"])
        idx = jax.lax.axis_index(axis_name)
        F_loc = x_loc.shape[1]
        tokens, grid = patchify(params, cfg, x_loc)
        e, e0 = time_embed(params, cfg, t_loc, tokens.dtype)
        # per-rank RoPE slice (xdit_context_parallel.py:52-57)
        cos, sin = rope.angles_for_grid(F_loc, h, w, idx * F_loc)
        if gather_mode:
            # cross-attn K/V cannot be precomputed over sp-sharded layer
            # weights; compute per layer inside the scan from the text
            # embedding instead (same math as dit.precompute_context)
            ctx_emb = _dit.embed_text(params, cfg, context)
            img_emb = (_dit.embed_image(params, clip_args[0])
                       if clip_args and cfg.model_type == "i2v" else None)

            def body(tok, i):
                # index the layer out of the stacked tree instead of
                # scanning it as xs: scan-carried xs force a scan-layout
                # COPY of the whole 40-layer weight stack (2 x 1.32 GB
                # of HLO temps at the 14B teacher, buffer-assignment
                # measured) — the same lesson as the decode kernel's
                # prefetched layer index (PERF.md cache-scan slice
                # elimination)
                bp_sharded = jax.tree_util.tree_map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, i, 0, keepdims=False), params["blocks"])
                bp = _sp_gather(bp_sharded, blocks_layer_specs, axis_name)
                p = bp["cross_attn"]
                k = _dit.linear(p["k"], ctx_emb)
                if cfg.qk_norm:
                    k = _dit._qk_rms_norm(k, p["norm_k"]["w"], cfg)
                v = _dit.linear(p["v"], ctx_emb)
                layer_ctx = {"k_txt": _dit._heads(cfg, k),
                             "v_txt": _dit._heads(cfg, v)}
                if img_emb is not None:
                    ki = _dit.linear(p["k_img"], img_emb)
                    if cfg.qk_norm:
                        ki = _dit._qk_rms_norm(ki, p["norm_k_img"]["w"],
                                               cfg)
                    layer_ctx["k_img"] = _dit._heads(cfg, ki)
                    layer_ctx["v_img"] = _dit._heads(
                        cfg, _dit.linear(p["v_img"], img_emb))
                tok = _block_sp(bp, cfg, tok, e0, cos, sin, layer_ctx,
                                frame_seqlen, axis_name, kv_valid=kv_valid)
                return tok, None

            num_layers = jax.tree_util.tree_leaves(
                params["blocks"])[0].shape[0]
            tokens, _ = jax.lax.scan(
                body, tokens, jnp.arange(num_layers, dtype=jnp.int32))
        else:
            ctx_kv = precompute_context(params, cfg, context,
                                        clip_args[0] if clip_args else None)

            def body(tok, xs):
                bp = xs[0]
                layer_ctx = {"k_txt": xs[1], "v_txt": xs[2]}
                if len(xs) > 3:
                    layer_ctx["k_img"], layer_ctx["v_img"] = xs[3], xs[4]
                tok = _block_sp(bp, cfg, tok, e0, cos, sin, layer_ctx,
                                frame_seqlen, axis_name, kv_valid=kv_valid)
                return tok, None

            xs = (params["blocks"], ctx_kv["k_txt"], ctx_kv["v_txt"])
            if "k_img" in ctx_kv:
                xs = xs + (ctx_kv["k_img"], ctx_kv["v_img"])
            tokens, _ = jax.lax.scan(body, tokens, xs)
        out_tokens = head_forward(params, cfg, tokens, e, frame_seqlen)
        return unpatchify(cfg, out_tokens, grid)

    pspec = P(None, axis_name)  # shard frame dim
    in_specs = (sp_specs if param_specs is not None else P(),
                pspec, pspec, P())
    args = (params, x, t, context)
    if clip_fea is not None:
        in_specs = in_specs + (P(),)
        args = args + (clip_fea,)
    # manual collectives only over the sp axis: every other mesh axis
    # (dp/fsdp) stays GSPMD-auto, so FSDP-sharded params compose — the
    # per-layer all-gather happens inside the scan exactly as in the
    # plain jit path.  This is what lets a 14B teacher (28 GB bf16 > one
    # chip) run sequence-parallel WITHOUT first materializing full
    # params per device (reference xdit + FSDP composition,
    # wan/distributed/xdit_context_parallel.py:66-184).
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=in_specs,
        out_specs=pspec,
        axis_names={axis_name},
        )
    # Trace with the XLA attention path: Pallas kernels carry no vma
    # annotation, which partial-auto shard_map's vma checking rejects
    # (and check_vma=False is incompatible with partial-auto: it
    # re-infers out_specs over ALL mesh axes).  Inside this leg only the
    # 512-token cross-attention would have dispatched Pallas — the ring
    # self-attention is XLA math either way.
    from self_forcing_tpu.ops import attention as _attn
    prev = _attn._ATTENTION_BACKEND
    _attn.set_attention_backend("xla")
    try:
        out = fn(*args)
    finally:
        _attn._ATTENTION_BACKEND = prev
    return out[:, :F] if F_pad != F else out
