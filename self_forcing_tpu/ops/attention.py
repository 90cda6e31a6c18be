"""Attention ops — the single seam the whole framework goes through.

The reference funnels every attention call through flash-attn / SDPA
(wan/modules/attention.py:32-202) and flex_attention with BlockMasks
(wan/modules/causal_model.py:119-193).  Here the same three shapes exist as
TPU-native ops:

- ``dense_attention``  — small-KV attention (cross-attn with 512 text
  tokens, VAE spatial attention).  Plain XLA dot + softmax: fuses fine and
  the score matrix is small.
- ``flash_attention``  — long-sequence self-attention with an
  :class:`~self_forcing_tpu.ops.masks.IntervalMask` (block-causal /
  teacher-forcing / i2v families).  Memory-safe chunked online softmax.
- ``decode_attention`` — KV-cache attention: queries attend a dynamic
  ``[kv_start, kv_end)`` window of a static-shape cache
  (reference: causal_model.py:230-236).

All use fp32 softmax accumulation with bf16 inputs.  A Pallas flash kernel
family (ops/pallas_attention.py) implements the same signatures for the hot
paths; these XLA versions are the reference implementation and the CPU
fallback, dispatch is via ``use_pallas``.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from self_forcing_tpu.ops.masks import IntervalMask

_NEG_INF = -1e30


def dense_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float | None = None,
                    bias: jax.Array | None = None) -> jax.Array:
    """softmax(q k^T * scale + bias) v.

    q: [B, Lq, N, D], k/v: [B, Lk, N, D] -> [B, Lq, N, D].
    fp32 softmax; output in q.dtype.
    """
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    scores = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def cross_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float | None = None,
                    heads_packed: int | None = None) -> jax.Array:
    """Cross-attention with a small static KV (512 text / 257 image
    tokens): Pallas single-pass kernel on TPU (the XLA einsum path
    materializes [N, Lq, Lk] f32 scores+probs in HBM — trace-measured
    ~2.7x the kernel's cost at 1.3B geometry), dense_attention elsewhere.

    ``heads_packed=N``: q (and the output) use the natural [B, Lq, N*D]
    column-packed layout; k/v stay [B, Lk, N, D] (tiny)."""
    if k.shape[1] <= 1024 and _use_pallas():
        from self_forcing_tpu.ops.pallas_attention import (
            cross_attention_pallas)
        return cross_attention_pallas(q, k, v, scale=scale,
                                      heads_packed=heads_packed)
    if heads_packed is not None:
        NH = heads_packed
        q4 = q.reshape(*q.shape[:2], NH, q.shape[-1] // NH)
        out = dense_attention(q4, k, v, scale=scale)
        return out.reshape(*out.shape[:2], -1)
    return dense_attention(q, k, v, scale=scale)


def _chunked_online_attention(q, k, v, scale, visible_fn, kv_chunk):
    """Online-softmax attention scanning KV in chunks.

    q: [B, Lq, N, D]; k/v: [B, Lk, N, D].
    ``visible_fn(kv_lo, kv_idx_in_chunk) -> bool [Lq, C]`` gives the mask for
    the chunk starting at kv_lo (static python int).
    """
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    qf = jnp.swapaxes(q, 1, 2).astype(jnp.float32) * scale    # [B,N,Lq,D]
    kf = jnp.swapaxes(k, 1, 2)                                 # [B,N,Lk,D]
    vf = jnp.swapaxes(v, 1, 2)

    num_chunks = -(-Lk // kv_chunk)
    pad = num_chunks * kv_chunk - Lk
    if pad:
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, pad), (0, 0)))

    kf = kf.reshape(B, N, num_chunks, kv_chunk, D).transpose(2, 0, 1, 3, 4)
    vf = vf.reshape(B, N, num_chunks, kv_chunk, D).transpose(2, 0, 1, 3, 4)
    chunk_ids = jnp.arange(num_chunks, dtype=jnp.int32)

    def body(carry, xs):
        m, l, o = carry            # [B,N,Lq,1], [B,N,Lq,1], [B,N,Lq,D]
        c, kc, vc = xs             # scalar, [B,N,C,D], [B,N,C,D]
        kv_lo = c * kv_chunk
        s = jnp.einsum("bnqd,bnkd->bnqk", qf, kc.astype(jnp.float32))
        idx = kv_lo + jnp.arange(kv_chunk, dtype=jnp.int32)
        vis = visible_fn(idx)                       # [Lq, C] bool
        vis = vis & (idx < Lk)[None, :]
        s = jnp.where(vis[None, None], s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        o_new = o * corr + jnp.einsum("bnqk,bnkd->bnqd", p,
                                      vc.astype(jnp.float32))
        return (m_new, l_new, o_new), None

    m0 = jnp.full((B, N, Lq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, N, Lq, 1), jnp.float32)
    o0 = jnp.zeros((B, N, Lq, D), jnp.float32)
    (m, l, o), _ = jax.lax.scan(body, (m0, l0, o0), (chunk_ids, kf, vf))
    out = o / jnp.maximum(l, 1e-30)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


_ATTENTION_BACKEND: str | None = None  # 'xla' | 'pallas' | None = auto


def set_attention_backend(name: str | None) -> None:
    """Force 'xla' or 'pallas' (None = auto: pallas on TPU)."""
    global _ATTENTION_BACKEND
    assert name in (None, "xla", "pallas"), name
    _ATTENTION_BACKEND = name


def _use_pallas() -> bool:
    if _ATTENTION_BACKEND is not None:
        return _ATTENTION_BACKEND == "pallas"
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    mask: IntervalMask | None = None,
                    scale: float | None = None,
                    kv_chunk: int = 1024,
                    fixed_m0: jax.Array | None = None,
                    softmax: str | None = None) -> jax.Array:
    """Masked long-sequence attention; dispatches to the Pallas kernel on
    TPU, the XLA chunked online-softmax reference elsewhere.

    ``fixed_m0``: optional f32 score upper bound enabling the Pallas
    kernel's bounded-offset softmax (exact; skips the running-max chain —
    see pallas_attention._flash_kernel).  Ignored by the XLA path.
    ``softmax='free'``: offset-free base-2 softmax; the caller pre-folded
    head_dim**-0.5 * log2(e) into q.  The XLA fallback recovers base-e
    exactness at scale=ln(2)."""
    if _use_pallas():
        from self_forcing_tpu.ops.pallas_attention import (
            flash_attention_pallas)
        return flash_attention_pallas(q, k, v, mask, scale=scale,
                                      fixed_m0=fixed_m0, softmax=softmax)
    if softmax == "free":
        scale = math.log(2.0)
    return flash_attention_xla(q, k, v, mask, scale=scale,
                               kv_chunk=kv_chunk)


def unfold_kv(a: jax.Array, num_heads: int) -> jax.Array:
    """Pre-folded cache [B*N, S, D] -> [B, S, N, D] (XLA reference paths).

    The production KV cache is stored pre-folded in the Pallas kernels'
    native layout so the hot path does zero transposes; the XLA fallback
    unfolds here instead."""
    if a.ndim == 3:
        BN, S, D = a.shape
        return a.reshape(BN // num_heads, num_heads, S, D).transpose(
            0, 2, 1, 3)
    return a


def decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                     kv_start: jax.Array, kv_end: jax.Array,
                     scale: float | None = None,
                     kv_chunk: int = 1560) -> jax.Array:
    """KV-cache window attention; Pallas kernel on TPU, XLA elsewhere.

    k_cache/v_cache: [B, S, N, D], or pre-folded [B*N, S, D]."""
    if _use_pallas():
        from self_forcing_tpu.ops.pallas_attention import (
            decode_attention_pallas)
        return decode_attention_pallas(q, k_cache, v_cache, kv_start,
                                       kv_end, scale=scale)
    if q.ndim == 3:
        # folded [BN, ., D] operands == singleton-head 4-D attention
        out = decode_attention_xla(q[:, :, None], k_cache[:, :, None],
                                   v_cache[:, :, None], kv_start, kv_end,
                                   scale=scale, kv_chunk=kv_chunk)
        return out[:, :, 0]
    N = q.shape[2]
    return decode_attention_xla(q, unfold_kv(k_cache, N),
                                unfold_kv(v_cache, N), kv_start, kv_end,
                                scale=scale, kv_chunk=kv_chunk)


@partial(jax.jit, static_argnames=("kv_chunk", "scale"))
def flash_attention_xla(q: jax.Array, k: jax.Array, v: jax.Array,
                        mask: IntervalMask | None = None,
                        scale: float | None = None,
                        kv_chunk: int = 1024) -> jax.Array:
    """Masked long-sequence attention, chunked online softmax.

    q/k/v: [B, L, N, D]; ``mask`` covers queries [0, Lq) and keys [0, Lk)
    (IntervalMask built for this exact geometry).  With mask=None this is
    full bidirectional attention computed memory-safely.
    """
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    Lq = q.shape[1]
    q_idx = jnp.arange(Lq, dtype=jnp.int32)

    if mask is None:
        def visible_fn(kv_idx):
            return jnp.ones((Lq, kv_idx.shape[0]), bool)
    else:
        s1, e1 = mask.start1[:Lq], mask.end1[:Lq]
        s2, e2 = mask.start2[:Lq], mask.end2[:Lq]

        def visible_fn(kv_idx):
            j = kv_idx[None, :]
            return (((j >= s1[:, None]) & (j < e1[:, None]))
                    | ((j >= s2[:, None]) & (j < e2[:, None])))

    del q_idx
    return _chunked_online_attention(q, k, v, scale, visible_fn, kv_chunk)


def decode_attention_fresh(q: jax.Array, k_cache: jax.Array,
                           v_cache: jax.Array, k_new: jax.Array,
                           v_new: jax.Array, kv_start: jax.Array,
                           kv_end: jax.Array,
                           scale: float | None = None,
                           static_hi: int | None = None,
                           quant: str | None = None,
                           layer_idx: jax.Array | None = None,
                           heads_packed: int | None = None,
                           fixed_m0: float | None = None,
                           softmax: str | None = None,
                           sink_end: jax.Array | None = None,
                           tk_align: int | None = None,
                           window_static: tuple | None = None
                           ) -> jax.Array:
    """KV-cache attention where the *current block's* K/V have not been
    written into the cache yet: queries see cache[kv_start:kv_end) plus all
    of k_new/v_new.

    This is the cache-bandwidth-friendly decode path: the cache stays
    read-only inside the per-layer scan and is updated once outside
    (models/wan/dit.py fast path), instead of hauling the multi-GB cache
    through scan carries.

    ``quant='int8'`` routes to the int8-MXU Pallas kernel (demo speed
    toggle); off-TPU the XLA fallback ignores it (full precision).
    The kernel quantizes q with ONE scale per (head, 472-row) tile —
    accurate when q rows are magnitude-homogeneous (the Wan DiT qk-norms
    q, so this holds on the production path); callers with wildly
    heterogeneous q row norms should not enable int8.

    With a STACKED cache [L, BN, S, D] plus ``layer_idx``, the Pallas
    kernel indexes the layer via a prefetched scalar — callers inside a
    per-layer lax.scan should close over the whole cache instead of
    scanning it (the per-layer slice costs a 100 MB materialization per
    layer per forward; PERF.md).

    With ``heads_packed=N``, q/k_new/v_new (and the output) use the
    natural [B, L, N*D] column-packed layout — the Pallas kernel slices
    head blocks out of the lane dimension, so no transpose exists around
    the call (the [BN, L, D] fold costs ~8 ms/forward in f32 layout
    copies at 1.3B geometry).

    ``softmax='free'``: offset-free base-2 softmax — the caller has
    pre-folded ``head_dim**-0.5 * log2(e)`` into q and verified the
    static qk-norm weight bound (models/wan/dit.py
    free_softmax_score_bound); pass ``scale=1.0``.  The XLA fallback
    recovers exactness by running base-e softmax at scale*ln(2).

    ``sink_end``: i32 scalar — the cache window becomes the two-interval
    union [0, sink_end) + [kv_start, kv_end): the windowed-streaming
    attention-sink view (causal_model.py:203-229 sink semantics without
    the physical roll).  ``tk_align``: cache-tile alignment hint for the
    Pallas kernel (the windowed caller passes frame_seqlen).
    """
    if _use_pallas():
        from self_forcing_tpu.ops.pallas_attention import (
            decode_attention_fresh_pallas)
        return decode_attention_fresh_pallas(q, k_cache, v_cache, k_new,
                                             v_new, kv_start, kv_end,
                                             scale=scale,
                                             static_hi=static_hi,
                                             quant=quant,
                                             layer_idx=layer_idx,
                                             heads_packed=heads_packed,
                                             fixed_m0=fixed_m0,
                                             softmax=softmax,
                                             sink_end=sink_end,
                                             tk_align=tk_align,
                                             window_static=window_static)
    if softmax == "free":
        # base-2 softmax of (s * scale) == base-e softmax at scale*ln(2)
        scale = (1.0 if scale is None else scale) * math.log(2.0)
    if k_cache.ndim == 4 and layer_idx is not None:
        k_cache = jax.lax.dynamic_index_in_dim(k_cache, layer_idx, 0,
                                               keepdims=False)
        v_cache = jax.lax.dynamic_index_in_dim(v_cache, layer_idx, 0,
                                               keepdims=False)
    if heads_packed is not None:
        NH = heads_packed
        q, k_new, v_new = (a.reshape(*a.shape[:2], NH, a.shape[-1] // NH)
                           for a in (q, k_new, v_new))
        out = decode_attention_fresh_xla(
            q, unfold_kv(k_cache, NH), unfold_kv(v_cache, NH),
            k_new, v_new, kv_start, kv_end, scale=scale,
            sink_end=sink_end)
        return out.reshape(*out.shape[:2], -1)
    if q.ndim == 3:
        # folded [BN, ., D] operands == singleton-head 4-D attention
        out = decode_attention_fresh_xla(
            q[:, :, None], k_cache[:, :, None], v_cache[:, :, None],
            k_new[:, :, None], v_new[:, :, None], kv_start, kv_end,
            scale=scale, sink_end=sink_end)
        return out[:, :, 0]
    N = q.shape[2]
    return decode_attention_fresh_xla(
        q, unfold_kv(k_cache, N), unfold_kv(v_cache, N),
        unfold_kv(k_new, N), unfold_kv(v_new, N),
        kv_start, kv_end, scale=scale, sink_end=sink_end)


@partial(jax.jit, static_argnames=("kv_chunk", "scale"))
def decode_attention_fresh_xla(q: jax.Array, k_cache: jax.Array,
                               v_cache: jax.Array, k_new: jax.Array,
                               v_new: jax.Array, kv_start: jax.Array,
                               kv_end: jax.Array,
                               scale: float | None = None,
                               kv_chunk: int = 1560,
                               sink_end: jax.Array | None = None
                               ) -> jax.Array:
    """XLA reference for decode_attention_fresh: concat [cache | new] and
    mask cache positions outside [0, sink_end) + [kv_start, kv_end)."""
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    Lq = q.shape[1]
    S = k_cache.shape[1]
    k_all = jnp.concatenate([k_cache, k_new.astype(k_cache.dtype)], axis=1)
    v_all = jnp.concatenate([v_cache, v_new.astype(v_cache.dtype)], axis=1)
    lo = jnp.asarray(kv_start, jnp.int32)
    hi = jnp.asarray(kv_end, jnp.int32)
    sk = jnp.asarray(0 if sink_end is None else sink_end, jnp.int32)

    def visible_fn(kv_idx):
        vis = jnp.where(kv_idx < S,
                        (kv_idx < sk) | ((kv_idx >= lo) & (kv_idx < hi)),
                        True)
        return jnp.broadcast_to(vis[None, :], (Lq, kv_idx.shape[0]))

    return _chunked_online_attention(q, k_all, v_all, scale, visible_fn,
                                     kv_chunk)


@partial(jax.jit, static_argnames=("kv_chunk", "scale"))
def decode_attention_xla(q: jax.Array, k_cache: jax.Array,
                         v_cache: jax.Array,
                         kv_start: jax.Array, kv_end: jax.Array,
                         scale: float | None = None,
                         kv_chunk: int = 1560) -> jax.Array:
    """KV-cache attention: all queries see cache[kv_start:kv_end).

    q: [B, Lq, N, D]; k_cache/v_cache: [B, S, N, D] (static S);
    kv_start/kv_end: i32 scalars (dynamic).  Mirrors the window-limited
    cache read at causal_model.py:230-236.
    """
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    Lq = q.shape[1]
    lo = jnp.asarray(kv_start, jnp.int32)
    hi = jnp.asarray(kv_end, jnp.int32)

    def visible_fn(kv_idx):
        vis = (kv_idx >= lo) & (kv_idx < hi)
        return jnp.broadcast_to(vis[None, :], (Lq, kv_idx.shape[0]))

    return _chunked_online_attention(q, k_cache, v_cache, scale, visible_fn,
                                     kv_chunk)
