"""Pallas TPU flash-attention kernels — the framework's hot ops.

These replace the external CUDA kernels the reference calls
(flash-attn: wan/modules/attention.py:119-150; flex_attention BlockMasks:
wan/modules/causal_model.py:119-193) with hand-written TPU kernels:

- :func:`decode_attention_pallas` — KV-cache attention for the streaming
  chunk-wise AR sampler: 4680 query tokens attend a dynamic ``[lo, hi)``
  window of a static [S, D] cache (reference causal_model.py:230-236).
  KV tiles wholly outside the window are *skipped* (predicated), so early
  blocks — when the cache is mostly empty — cost a fraction of dense.
- :func:`flash_attention_pallas` — masked self-attention for training with
  an :class:`~self_forcing_tpu.ops.masks.IntervalMask` (block-causal /
  teacher-forcing / i2v).  The mask is static geometry: per-(q-tile,
  kv-tile) visibility is precomputed on the host and fully-masked tiles
  are skipped, giving block-sparse compute like flex-attention's BlockMask.

Kernel structure (per pallas_guide.md): grid (batch*heads, q_tiles,
kv_tiles) with the kv dimension innermost; online-softmax state (m, l,
acc) lives in VMEM scratch persisting across kv iterations; fp32
accumulation, bf16 tensor I/O; scores hit the MXU as [TQ, 128] x [128, TK]
contractions.

Differentiation:

- :func:`flash_attention_pallas` has a full Pallas backward: the forward
  emits logsumexp alongside the output, and two backward kernels
  (:func:`_flash_bwd_dq_kernel`, :func:`_flash_bwd_dkv_kernel`) recompute
  probabilities from (q, k, lse) tile-by-tile — the standard
  flash-attention-2 recomputation scheme — with the same static
  tile-liveness skipping as the forward, so block-sparse masks stay
  block-sparse in the gradient.
- :func:`decode_attention_fresh_pallas` (inference-shaped; rarely
  differentiated) carries a ``jax.custom_vjp`` whose backward re-runs the
  XLA reference implementation (ops/attention.py) under ``jax.vjp``.
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from self_forcing_tpu.ops.masks import IntervalMask

NEG_INF = -1e30
LN127 = math.log(127.0)  # folds p-quantization's x127 into the exp bias


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_to(x: jax.Array, axis: int, size: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


# =====================================================================
# decode attention: queries over a dynamic [lo, hi) cache window
# =====================================================================

def _decode_kernel(lo_ref, hi_ref, q_ref, k_ref, v_ref, o_ref,
                   m_scr, l_scr, acc_scr, *, scale: float, tk: int,
                   kv_len: int):
    """Grid (BN, QT, KT); kv innermost.  lo/hi: SMEM scalars (prefetched)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    lo = lo_ref[0]
    hi = hi_ref[0]
    kv_base = ki * tk
    # tile overlaps the visible window?
    live = (kv_base < hi) & (kv_base + tk > lo)

    @pl.when(live)
    def _compute():
        q = q_ref[0].astype(jnp.float32) * scale          # [TQ, D]
        k = k_ref[0].astype(jnp.float32)                  # [TK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [TQ, TK]
        col = kv_base + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        vis = (col >= lo) & (col < hi) & (col < kv_len)
        s = jnp.where(vis, s, NEG_INF)

        m_prev = m_scr[:, 0:1]                            # [TQ, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)                            # [TQ, TK]
        corr = jnp.exp(m_prev - m_new)                    # [TQ, 1]
        l_new = l_scr[:, 0:1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0].astype(jnp.float32)                  # [TK, D]
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [TQ, D]
        acc_scr[:] = acc_scr[:] * corr + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:, 0:1]
        o_ref[0] = (acc_scr[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _fold_kv(a: jax.Array) -> jax.Array:
    """[B, S, N, D] -> [BN, S, D]; pre-folded [BN, S, D] passes through
    (the production cache is stored in this kernel-native layout so the
    hot path does zero transposes)."""
    if a.ndim == 4:
        B, S, N, D = a.shape
        return a.transpose(0, 2, 1, 3).reshape(B * N, S, D)
    return a


def _fold_q(q: jax.Array) -> jax.Array:
    """[B, Lq, N, D] -> [BN, Lq, D]; pre-folded 3-D passes through.

    The DiT decode path emits q/k/v directly in the folded layout
    (models/wan/dit.py _qkv_rope_folded) — norm/RoPE fusions then share
    the kernel operand layout, which removes ~8 ms/forward of f32 layout
    copies at 1.3B geometry.  When q arrives folded the kernel output is
    returned folded too."""
    if q.ndim == 4:
        B, Lq, N, D = q.shape
        return q.transpose(0, 2, 1, 3).reshape(B * N, Lq, D)
    return q


def _unfold_like_q(out: jax.Array, q: jax.Array) -> jax.Array:
    """Kernel output [BN, Lq, D] back to q's layout (4-D or folded)."""
    if q.ndim == 3:
        return out
    B, Lq, N, D = q.shape
    return out.reshape(B, N, Lq, D).transpose(0, 2, 1, 3)


def _decode_fwd(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                kv_start: jax.Array, kv_end: jax.Array, scale: float,
                tq: int, tk: int, interpret: bool) -> jax.Array:
    Lq = q.shape[1]
    D = q.shape[-1]
    BN = q.shape[0] * (q.shape[2] if q.ndim == 4 else 1)
    S = k_cache.shape[1]   # token axis in both layouts
    qt = _cdiv(Lq, tq)
    kt = _cdiv(S, tk)

    qf = _pad_to(_fold_q(q), 1, qt * tq)
    kf = _pad_to(_fold_kv(k_cache), 1, kt * tk)
    vf = _pad_to(_fold_kv(v_cache), 1, kt * tk)

    lo = jnp.asarray(kv_start, jnp.int32).reshape(1)
    hi = jnp.asarray(kv_end, jnp.int32).reshape(1)

    def kv_idx(b, qi, ki, lo, hi):
        # Clamp dead tiles (outside [lo, hi)) onto the live range so
        # consecutive dead grid steps re-reference the already-resident
        # block and Mosaic elides their DMAs entirely.
        first = lo[0] // tk
        last = jnp.maximum((hi[0] - 1) // tk, first)
        return (b, jnp.clip(ki, first, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BN, qt, kt),
        in_specs=[
            pl.BlockSpec((1, tq, D), lambda b, qi, ki, lo, hi: (b, qi, 0)),
            pl.BlockSpec((1, tk, D), kv_idx),
            pl.BlockSpec((1, tk, D), kv_idx),
        ],
        out_specs=pl.BlockSpec((1, tq, D),
                               lambda b, qi, ki, lo, hi: (b, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, tk=tk, kv_len=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BN, qt * tq, D), q.dtype),
        interpret=interpret,
    )(lo, hi, qf, kf, vf)
    return _unfold_like_q(out[:, :Lq], q)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _decode_op(q, k_cache, v_cache, kv_start, kv_end, scale, tq, tk,
               interpret):
    return _decode_fwd(q, k_cache, v_cache, kv_start, kv_end, scale, tq, tk,
                       interpret)


def _decode_op_fwd(q, k_cache, v_cache, kv_start, kv_end, scale, tq, tk,
                   interpret):
    out = _decode_fwd(q, k_cache, v_cache, kv_start, kv_end, scale, tq, tk,
                      interpret)
    return out, (q, k_cache, v_cache, kv_start, kv_end)


def _decode_op_bwd(scale, tq, tk, interpret, res, g):
    """Backward through the XLA reference (decode_attention_xla directly —
    re-entering the dispatcher would recurse through this custom_vjp).
    Folded operands ([BN, S, D]) are viewed as singleton-head 4-D: the
    math is head-batched, so [BN, S, 1, D] attention is identical."""
    from self_forcing_tpu.ops import attention as xla_attn
    q, k_cache, v_cache, kv_start, kv_end = res
    folded = q.ndim == 3
    if folded:
        q4, k4, v4, g4 = (a[:, :, None] for a in (q, k_cache, v_cache, g))
    else:
        N = q.shape[2]
        q4, g4 = q, g
        k4 = xla_attn.unfold_kv(k_cache, N)
        v4 = xla_attn.unfold_kv(v_cache, N)

    def ref(q_, k_, v_):
        return xla_attn.decode_attention_xla(q_, k_, v_, kv_start, kv_end,
                                             scale=scale)

    _, vjp = jax.vjp(ref, q4, k4, v4)
    dq, dk, dv = vjp(g4)
    if folded:
        dq, dk, dv = (a[:, :, 0] for a in (dq, dk, dv))
    elif k_cache.ndim == 3:
        dk, dv = _fold_kv(dk), _fold_kv(dv)
    return dq, dk, dv, None, None


_decode_op.defvjp(_decode_op_fwd, _decode_op_bwd)


def decode_attention_pallas(q: jax.Array, k_cache: jax.Array,
                            v_cache: jax.Array, kv_start: jax.Array,
                            kv_end: jax.Array,
                            scale: Optional[float] = None,
                            tq: int = 256, tk: int = 2048,
                            interpret: bool = False) -> jax.Array:
    """Same signature/semantics as ops.attention.decode_attention.

    Default tiles tuned on v5e at Wan-1.3B geometry (Lq=4680, S=32760,
    12x128 heads): tq=256/tk=2048 reaches ~110 bf16 TFLOP/s vs ~27 for the
    XLA chunked reference — 4x, with dead-window tiles skipped on top."""
    D = q.shape[-1]
    scale = (D ** -0.5) if scale is None else scale
    tq = min(tq, max(128, 1 << (q.shape[1] - 1).bit_length()))
    return _decode_op(q, k_cache, v_cache,
                      jnp.asarray(kv_start, jnp.int32),
                      jnp.asarray(kv_end, jnp.int32),
                      scale, tq, tk, interpret)


# =====================================================================
# decode attention with fresh (not-yet-cached) block KV
# =====================================================================

def _decode_fresh_kernel(li_ref, lo_ref, hi_ref, sk_ref, m0_ref, q_ref,
                         k_ref, v_ref, kn_ref, vn_ref, o_ref, m_scr, l_scr,
                         acc_scr, *, scale: float, tq: int, tk: int,
                         tf: int, kv_len: int, kt_cache: int,
                         fresh_len: int, bounded: bool = False,
                         n_sink_tiles: int | None = None):
    """Flash-decode layout: grid (BN, KT_cache + KT_fresh, QT) with q
    INNERMOST so every KV tile is streamed from HBM exactly once; the
    online-softmax state for all q tiles stays resident in VMEM scratch
    ([QT*tq, ...] slices indexed by qi).

    The cache operands are the FULL stacked [L, BN, S, D] buffers with the
    layer selected by the prefetched ``li`` scalar in the BlockSpec index
    map: feeding lax.scan's per-layer slice instead costs a 100 MB
    dynamic-slice materialization per layer per forward (~18.6 ms/forward
    at 1.3B geometry — measured, see PERF.md).

    ``sk_ref`` (sink_hi): the cache window is the TWO-interval union
    [0, sink_hi) + [lo, hi) — the windowed-streaming path keeps attention
    sinks at the buffer front and appends recent blocks without any
    eviction roll (reference sink semantics, causal_model.py:203-229);
    sink_hi == 0 recovers the single-interval [lo, hi) window.

    ``n_sink_tiles``: COMPRESSED-window grid (windowed streaming): the
    cache grid has only n_sink + n_recent steps; steps < n_sink map to
    buffer tiles 0.. (the sink region) and the rest map to the tiles
    covering [lo, hi) via the prefetched ``lo`` (the BlockSpec index map
    applies the same translation) — grid cost stays O(window) however
    large the append buffer grows.  The two interval masks are then
    per-step disjoint (a tile visited as both sink and recent
    accumulates each column exactly once)."""
    ki = pl.program_id(1)
    nk = pl.num_programs(1)
    qi = pl.program_id(2)

    row = pl.multiple_of(qi * tq, tq)

    @pl.when(ki == 0)
    def _init():
        if not bounded:
            m_scr[pl.ds(row, tq), :] = jnp.full((tq, 128), NEG_INF,
                                                jnp.float32)
        l_scr[pl.ds(row, tq), :] = jnp.zeros((tq, 128), jnp.float32)
        acc_scr[pl.ds(row, tq), :] = jnp.zeros_like(acc_scr[pl.ds(row, tq), :])

    lo = lo_ref[0]
    hi = hi_ref[0]
    sk = sk_ref[0]
    is_cache = ki < kt_cache
    if n_sink_tiles is None:
        kv_base = ki * tk
        live = jnp.where(is_cache, ((kv_base < hi) & (kv_base + tk > lo))
                         | (kv_base < sk), True)
    else:
        # compressed-window grid (see the class docstring): clipped
        # overflow steps are duplicates of the last live tile and MUST
        # be dead, or that tile double-accumulates.
        sink_step = ki < n_sink_tiles
        lo_t = lo // tk
        last_t = jnp.maximum((hi - 1) // tk, lo_t)
        over = lo_t + (ki - n_sink_tiles) > last_t
        kc = jnp.where(sink_step, ki,
                       jnp.clip(lo_t + (ki - n_sink_tiles), lo_t, last_t))
        kv_base = kc * tk
        live = jnp.where(is_cache,
                         jnp.where(sink_step, kv_base < sk,
                                   ~over & (kv_base < hi)
                                   & (kv_base + tk > lo)),
                         True)

    def _accumulate(k, v, vis):
        if bounded in ("free", "free_noclamp"):
            # OFFSET-FREE softmax: with qk-norm the scores are bounded by
            # activation norms that sit ~11 nats at unit gains — far from
            # exp2's +/-126 range — so softmax needs NO stability offset
            # at all: not the online running max, not even the bounded
            # mode's m0 bias.  p = 2^s directly; the caller pre-folds
            # scale * log2(e) into q (models/wan/dit.py folds it into the
            # q-norm gain, a free [dim]-vector multiply), so the whole
            # per-score-element VPU chain is clamp -> exp2 -> bf16-convert
            # -> l-sum.  The one-op upper clamp at 80 log2-units makes the
            # kernel overflow-proof for ARBITRARY data (exact whenever
            # scores < 80 ~ 55 nats, which full-dim qk-norm keeps by a
            # wide margin; past it the top scores flatten gracefully
            # instead of producing inf/NaN).  'free_noclamp' drops the
            # clamp for kernel A/Bs.
            s = jax.lax.dot_general(q_ref[0], k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if scale != 1.0:
                s = s * scale
            if vis is not None:
                s = jnp.where(vis, s, NEG_INF)
            if bounded == "free":
                s = jnp.minimum(s, 80.0)
            p = jnp.exp2(s)
            l_scr[pl.ds(row, tq), 0:1] = (
                l_scr[pl.ds(row, tq), 0:1]
                + jnp.sum(p, axis=-1, keepdims=True))
            pv = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_scr[pl.ds(row, tq), :] = acc_scr[pl.ds(row, tq), :] + pv
            return
        if bounded:
            # BOUNDED-offset softmax: the caller passes a per-layer upper
            # bound m0 >= max score (Cauchy-Schwarz over q/cached-K row
            # norms — models/wan/dit.py), so the per-tile running max and
            # its correction chain are dead VPU work: p = exp(s - m0) is
            # *mathematically exact* softmax (a stability offset is the
            # only role the max plays), and exp underflow from the bound's
            # slack only matters past e^-80.  Measured 12% faster at the
            # full 32760-token window (9.79 -> 8.70 ms; rel diff vs the
            # online kernel 1.3e-3 = bf16 noise).  The scale multiply
            # folds into the exp argument FMA and the bf16 operands feed
            # the MXU uncast.
            s = jax.lax.dot_general(q_ref[0], k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if scale != 1.0:
                s = s * scale
            if vis is not None:
                s = jnp.where(vis, s, NEG_INF)
            p = jnp.exp(s - m0_ref[0])
            l_scr[pl.ds(row, tq), 0:1] = (
                l_scr[pl.ds(row, tq), 0:1]
                + jnp.sum(p, axis=-1, keepdims=True))
            pv = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_scr[pl.ds(row, tq), :] = acc_scr[pl.ds(row, tq), :] + pv
            return
        q = q_ref[0].astype(jnp.float32) * scale
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if vis is not None:
            s = jnp.where(vis, s, NEG_INF)
        m_prev = m_scr[pl.ds(row, tq), 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = (l_scr[pl.ds(row, tq), 0:1] * corr
                 + jnp.sum(p, axis=-1, keepdims=True))
        pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[pl.ds(row, tq), :] = acc_scr[pl.ds(row, tq), :] * corr + pv
        m_scr[pl.ds(row, tq), :] = jnp.broadcast_to(m_new, (tq, 128))
        l_scr[pl.ds(row, tq), :] = jnp.broadcast_to(l_new, (tq, 128))

    def _cast(ref):
        # bounded mode feeds bf16 straight to the MXU; online mode keeps
        # the historical f32 staging (Mosaic demotes it anyway)
        return ref if bounded else ref.astype(jnp.float32)

    # fully-inside tiles skip the visibility mask entirely (the mask's
    # iota/compare/select chain costs ~1 ms/layer at the full window —
    # 7.5% of the whole denoise; measured on v5e)
    if n_sink_tiles is None:
        cache_full = (((kv_base >= lo)
                       & (kv_base + tk <= jnp.minimum(hi, kv_len)))
                      | (kv_base + tk <= sk))
    else:
        cache_full = jnp.where(
            sink_step, kv_base + tk <= sk,
            (kv_base >= lo) & (kv_base + tk <= jnp.minimum(hi, kv_len)))
    fresh_base = (ki - kt_cache) * tf
    fresh_full = fresh_base + tf <= fresh_len

    @pl.when(live & is_cache & cache_full)
    def _cache_tile_full():
        _accumulate(_cast(k_ref[0, 0]), _cast(v_ref[0, 0]), None)

    @pl.when(live & is_cache & ~cache_full)
    def _cache_tile():
        col = kv_base + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        if n_sink_tiles is None:
            vis = ((col < sk) | ((col >= lo) & (col < hi))) & (col < kv_len)
        else:
            # boolean algebra, not where(): Mosaic cannot legalize a
            # select on i1 vectors
            vis = ((sink_step & (col < sk))
                   | (~sink_step & (col >= lo) & (col < hi))) \
                & (col < kv_len)
        _accumulate(_cast(k_ref[0, 0]), _cast(v_ref[0, 0]), vis)

    @pl.when(~is_cache & fresh_full)
    def _fresh_tile_full():
        _accumulate(_cast(kn_ref[0]), _cast(vn_ref[0]), None)

    @pl.when(~is_cache & ~fresh_full)
    def _fresh_tile():
        col = fresh_base + jax.lax.broadcasted_iota(jnp.int32, (tq, tf), 1)
        vis = col < fresh_len
        _accumulate(_cast(kn_ref[0]), _cast(vn_ref[0]), vis)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[pl.ds(row, tq), 0:1]
        o_ref[0] = (acc_scr[pl.ds(row, tq), :]
                    / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _decode_fresh_int8_kernel(li_ref, lo_ref, hi_ref, sk_ref, m0_ref, q_ref,
                              k_ref, v_ref, kn_ref, vn_ref, o_ref, m_scr,
                              l_scr, acc_scr,
                              kq_scr, vq_scr, qq_scr, qs_scr, sc_scr, *,
                              scale: float,
                              tq: int, tk: int, tf: int, kv_len: int,
                              kt_cache: int, fresh_len: int,
                              bounded=False,
                              n_sink_tiles: int | None = None):
    """int8 variant of :func:`_decode_fresh_kernel` — the demo-config
    speed toggle (reference FP8 linears analog, extended to attention).

    Both contractions run on the MXU's native int8 path (v5e: 394 TOP/s
    peak vs 197 bf16): QK^T as (q int8, per-row scale) x (k int8, one
    symmetric per-tile scale), P·V as (round(p*127) — p is in [0,1] after
    the online-softmax exp) x (v int8 per-tile scale).  K/V tiles are
    quantized ONCE per tile visit (qi == 0, q innermost) into VMEM
    scratch, so the quantization VPU cost is amortized over all q tiles.
    Softmax state stays fp32 — only the two matmuls are quantized
    (SageAttention-style; arXiv:2410.02367 uses the same decomposition).

    ``bounded=True`` (cfg.attn_softmax='bounded' + attn_quant='int8'):
    the int8 path was VPU-bound, not MXU-bound — halving MXU work bought
    nothing while the dequant/round/correction chain ran ~10 VPU ops per
    score element (PERF.md).  This mode cuts that chain to ~6:
    - q tiles are quantized ONCE (ki == 0) into ``qq_scr`` with a
      per-TILE scalar scale in SMEM (``qs_scr``);
    - the x127 of the p-quantization folds into the exp argument
      (127*e^(s-m0) = e^(s-m0+ln127)), so p comes out of the single fused
      convert*a+b -> exp chain already in [0, 127] and goes straight to
      the round/int8 convert; ``l`` sums the scaled p, so the final
      acc/l divide cancels the 127 (and the v-scale dequant multiplies
      [tq, D] accumulator columns, not [tq, tk] score elements);
    - no running max, no correction multiplies (the caller's m0 bound
      plays the max's stability role, exactly as in the bf16 bounded
      kernel).
    CAVEAT for ``bounded='global'`` (sharper than the bf16 kernel's
    87-nat cliff): scores more than ln(254) ~ 5.5 nats below m0 quantize
    to p=0, so the bound's slack directly eats softmax tail mass.  With
    qk-norm the Cauchy-Schwarz bound is tight when any strong match
    exists (slack = -ln max cos); the loose-bound regime is near-uniform
    attention where the tail truncation biases output toward zero.
    Accuracy-checked in tests/test_pallas_attention.py against the f32
    reference.

    ``bounded='tile'`` — the SAFE bounded variant (the production
    default for attn_quant='int8'): p quantizes against the exact
    per-row max *within each kv tile* (one VPU max-reduce over the score
    tile — the only op this adds vs 'global'), and each tile's
    contribution to l/acc is weighted by exp(m_tile - m0) <= 1.  The
    quantization step is then always 1/254 of the row's within-tile max:
    no truncation cliff, int8-noise accuracy for ANY m0 (the bound's
    only remaining role is keeping exp(m_tile - m0) inside f32 range,
    |slack| < ~80 nats — same regime as the bf16 bounded kernel).
    Unlike the online path there is still no cross-tile correction
    chain: no m_prev read/compare, no l/acc rescale, no broadcast
    stores of softmax state.
    """
    ki = pl.program_id(1)
    nk = pl.num_programs(1)
    qi = pl.program_id(2)
    row = pl.multiple_of(qi * tq, tq)

    @pl.when(ki == 0)
    def _init():
        if not bounded:
            m_scr[pl.ds(row, tq), :] = jnp.full((tq, 128), NEG_INF,
                                                jnp.float32)
        l_scr[pl.ds(row, tq), :] = jnp.zeros((tq, 128), jnp.float32)
        acc_scr[pl.ds(row, tq), :] = jnp.zeros_like(acc_scr[pl.ds(row, tq), :])

    @pl.when(ki == 0)
    def _quantize_q_tile():
        # q is re-read by every kv tile (q innermost): quantize it ONCE
        # into VMEM scratch, with a per-TILE scalar scale in SMEM (per-row
        # scales need sub-lane reads every accumulate — measured slower;
        # production q is qk-normed, so rows are homogeneous anyway).
        q = q_ref[0].astype(jnp.float32)
        qs = jnp.maximum(jnp.max(jnp.abs(q)), 1e-8) / 127.0
        qq_scr[pl.ds(row, tq), :] = jnp.round(q / qs).astype(jnp.int8)
        qs_scr[qi] = qs

    lo = lo_ref[0]
    hi = hi_ref[0]
    sk = sk_ref[0]
    is_cache = ki < kt_cache
    if n_sink_tiles is None:
        kv_base = ki * tk
        live = jnp.where(is_cache, ((kv_base < hi) & (kv_base + tk > lo))
                         | (kv_base < sk), True)
    else:
        # compressed-window grid: see _decode_fresh_kernel.  Clipped
        # overflow steps are duplicates of the last live tile and MUST
        # be dead, or that tile double-accumulates.
        sink_step = ki < n_sink_tiles
        lo_t = lo // tk
        last_t = jnp.maximum((hi - 1) // tk, lo_t)
        over = lo_t + (ki - n_sink_tiles) > last_t
        kc = jnp.where(sink_step, ki,
                       jnp.clip(lo_t + (ki - n_sink_tiles), lo_t, last_t))
        kv_base = kc * tk
        live = jnp.where(is_cache,
                         jnp.where(sink_step, kv_base < sk,
                                   ~over & (kv_base < hi)
                                   & (kv_base + tk > lo)),
                         True)

    qk_only = bounded == "free_qk"

    @pl.when(live & is_cache & (qi == 0))
    def _quantize_cache_tile():
        k = k_ref[0, 0].astype(jnp.float32)
        ks = jnp.maximum(jnp.max(jnp.abs(k)) / 127.0, 1e-8)
        kq_scr[pl.ds(0, tk), :] = jnp.round(k / ks).astype(jnp.int8)
        sc_scr[0] = ks
        if not qk_only:
            v = v_ref[0, 0].astype(jnp.float32)
            vs = jnp.maximum(jnp.max(jnp.abs(v)) / 127.0, 1e-8)
            vq_scr[pl.ds(0, tk), :] = jnp.round(v / vs).astype(jnp.int8)
            sc_scr[1] = vs

    @pl.when(~is_cache & (qi == 0))
    def _quantize_fresh_tile():
        k = kn_ref[0].astype(jnp.float32)
        ks = jnp.maximum(jnp.max(jnp.abs(k)) / 127.0, 1e-8)
        kq_scr[pl.ds(0, tf), :] = jnp.round(k / ks).astype(jnp.int8)
        sc_scr[0] = ks
        if not qk_only:
            v = vn_ref[0].astype(jnp.float32)
            vs = jnp.maximum(jnp.max(jnp.abs(v)) / 127.0, 1e-8)
            vq_scr[pl.ds(0, tf), :] = jnp.round(v / vs).astype(jnp.int8)
            sc_scr[1] = vs

    def _accumulate(vis, width, vref=None):
        if bounded == "free_qk":
            # int8 QK + bf16 PV in the offset-free base-2 softmax: halves
            # the QK dot's MXU floor (SageAttention-style, but the PV dot
            # stays bf16 so p never needs quantizing — the int8-p max
            # problem vanishes).  The caller pre-folded scale*log2(e)
            # into q BEFORE quantization, so the dequantized product is
            # already in log2 units.  Per-score-element chain: convert,
            # mul, (mask,) clamp, exp2, bf16-convert.
            qq = qq_scr[pl.ds(row, tq), :]
            s_i32 = jax.lax.dot_general(
                qq, kq_scr[pl.ds(0, width), :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            a = qs_scr[qi] * sc_scr[0]
            if scale != 1.0:
                a = a * scale
            s = s_i32.astype(jnp.float32) * a
            if vis is not None:
                s = jnp.where(vis, s, NEG_INF)
            p = jnp.exp2(jnp.minimum(s, 80.0))
            l_scr[pl.ds(row, tq), 0:1] = (
                l_scr[pl.ds(row, tq), 0:1]
                + jnp.sum(p, axis=-1, keepdims=True))
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vref(), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_scr[pl.ds(row, tq), :] = acc_scr[pl.ds(row, tq), :] + pv
            return
        if bounded == "tile":
            # SAFE bounded mode: quantize p against the exact per-row max
            # within this tile, weight the tile's contribution by
            # exp(m_tile - m0) <= 1.  Per-score-element VPU chain is
            # convert, fma, (mask,) max-reduce, sub+exp, round, convert —
            # one op more than 'global' (the max) but no min clamp
            # (p <= 127 by construction) and still no cross-tile
            # correction chain.
            qq = qq_scr[pl.ds(row, tq), :]
            s_i32 = jax.lax.dot_general(
                qq, kq_scr[pl.ds(0, width), :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            a = qs_scr[qi] * (sc_scr[0] * scale)
            s = s_i32.astype(jnp.float32) * a
            if vis is not None:
                s = jnp.where(vis, s, NEG_INF)
            # live tiles always have >= 1 visible column (the mask is
            # column-only), so m_t is finite
            m_t = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - (m_t - LN127))       # in [0, 127] exactly
            w = jnp.exp(m_t - m0_ref[0])         # <= 1: m0 bounds all s
            l_scr[pl.ds(row, tq), 0:1] = (
                l_scr[pl.ds(row, tq), 0:1]
                + jnp.sum(p, axis=-1, keepdims=True) * w)
            pq = jnp.round(p).astype(jnp.int8)
            pv_i32 = jax.lax.dot_general(
                pq, vq_scr[pl.ds(0, width), :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc_scr[pl.ds(row, tq), :] = (acc_scr[pl.ds(row, tq), :]
                                          + pv_i32.astype(jnp.float32)
                                          * (sc_scr[1] * w))
            return
        if bounded:
            # fused dequant+offset: s_true = s_i32 * (qs*ks*scale); the
            # p-quantization's x127 folds into the exp bias, so the whole
            # per-score-element VPU chain is convert, fma, exp, (mask,)
            # min, round, convert — no max reduce, no corrections.
            qq = qq_scr[pl.ds(row, tq), :]
            s_i32 = jax.lax.dot_general(
                qq, kq_scr[pl.ds(0, width), :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            a = qs_scr[qi] * (sc_scr[0] * scale)
            p = jnp.exp(s_i32.astype(jnp.float32) * a
                        + (LN127 - m0_ref[0]))
            if vis is not None:
                p = jnp.where(vis, p, 0.0)
            # quantization noise on s can push p past 127 by a hair; a
            # wrap in the int8 convert would be catastrophic
            p = jnp.minimum(p, 127.0)
            l_scr[pl.ds(row, tq), 0:1] = (
                l_scr[pl.ds(row, tq), 0:1]
                + jnp.sum(p, axis=-1, keepdims=True))
            pq = jnp.round(p).astype(jnp.int8)
            pv_i32 = jax.lax.dot_general(
                pq, vq_scr[pl.ds(0, width), :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # l sums the x127-scaled p, so vs alone dequants: the 127
            # cancels in finalize's acc/l
            acc_scr[pl.ds(row, tq), :] = (acc_scr[pl.ds(row, tq), :]
                                          + pv_i32.astype(jnp.float32)
                                          * sc_scr[1])
            return
        # online-max path, VPU-lean form: q pre-quantized in scratch; the
        # p-quantization's x127 folds into the exp bias (l then sums the
        # x127-scaled p and the final acc/l divide cancels it).
        qq = qq_scr[pl.ds(row, tq), :]
        s_i32 = jax.lax.dot_general(
            qq, kq_scr[pl.ds(0, width), :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        s = s_i32.astype(jnp.float32) * (qs_scr[qi] * (sc_scr[0] * scale))
        if vis is not None:
            s = jnp.where(vis, s, NEG_INF)
        m_prev = m_scr[pl.ds(row, tq), 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - (m_new - LN127))      # = 127 * softmax-numerator
        corr = jnp.exp(m_prev - m_new)
        l_new = (l_scr[pl.ds(row, tq), 0:1] * corr
                 + jnp.sum(p, axis=-1, keepdims=True))
        pq = jnp.round(p).astype(jnp.int8)
        pv_i32 = jax.lax.dot_general(
            pq, vq_scr[pl.ds(0, width), :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        pv = pv_i32.astype(jnp.float32) * sc_scr[1]
        acc_scr[pl.ds(row, tq), :] = acc_scr[pl.ds(row, tq), :] * corr + pv
        # full-tile broadcast stores: a [tq, 1] column store lowers to a
        # read-modify-write of the (8,128) tiles and measured SLOWER than
        # broadcasting (9.44 vs 8.5 ms/call at the full window)
        m_scr[pl.ds(row, tq), :] = jnp.broadcast_to(m_new, (tq, 128))
        l_scr[pl.ds(row, tq), :] = jnp.broadcast_to(l_new, (tq, 128))

    if n_sink_tiles is None:
        cache_full = (((kv_base >= lo)
                       & (kv_base + tk <= jnp.minimum(hi, kv_len)))
                      | (kv_base + tk <= sk))
    else:
        cache_full = jnp.where(
            sink_step, kv_base + tk <= sk,
            (kv_base >= lo) & (kv_base + tk <= jnp.minimum(hi, kv_len)))
    fresh_base = (ki - kt_cache) * tf
    fresh_full = fresh_base + tf <= fresh_len

    @pl.when(live & is_cache & cache_full)
    def _cache_tile_full():
        _accumulate(None, tk, lambda: v_ref[0, 0])

    @pl.when(live & is_cache & ~cache_full)
    def _cache_tile():
        col = kv_base + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        if n_sink_tiles is None:
            vis = ((col < sk) | ((col >= lo) & (col < hi))) & (col < kv_len)
        else:
            # boolean algebra, not where(): Mosaic cannot legalize a
            # select on i1 vectors
            vis = ((sink_step & (col < sk))
                   | (~sink_step & (col >= lo) & (col < hi))) \
                & (col < kv_len)
        _accumulate(vis, tk, lambda: v_ref[0, 0])

    @pl.when(~is_cache & fresh_full)
    def _fresh_tile_full():
        _accumulate(None, tf, lambda: vn_ref[0])

    @pl.when(~is_cache & ~fresh_full)
    def _fresh_tile():
        col = fresh_base + jax.lax.broadcasted_iota(jnp.int32, (tq, tf), 1)
        _accumulate(col < fresh_len, tf, lambda: vn_ref[0])

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[pl.ds(row, tq), 0:1]
        o_ref[0] = (acc_scr[pl.ds(row, tq), :]
                    / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _decode_fresh_fwd(q, k_cache, v_cache, k_new, v_new, kv_start, kv_end,
                      sink_end, m0, scale, tq, tk, tf, interpret,
                      static_hi=None, quant=None, layer_idx=None,
                      heads_packed=None, bounded=False, window_tiles=None):
    Lq = q.shape[1]
    if heads_packed is not None:
        # Column-sliced operands: q/k_new/v_new (and the output) keep the
        # natural [B, L, N*D] matmul-output layout; the BlockSpec picks
        # head n as a 128-wide column block.  No transpose then exists in
        # the XLA graph around the kernel (the [BN, L, D] fold costs two
        # f32 layout copies per tensor, ~8 ms/forward at 1.3B; the
        # strided DMA this trades for costs <5% of kernel time even with
        # the whole KV strided — measured).  The cache stays folded
        # [L, BN, S, D] (contiguous reads on the big stream).
        NH = heads_packed
        D = q.shape[-1] // NH
        BN = q.shape[0] * NH
    else:
        NH = None
        D = q.shape[-1]
        BN = q.shape[0] * (q.shape[2] if q.ndim == 4 else 1)
    Lf = k_new.shape[1]  # token axis in both layouts
    qt = _cdiv(Lq, tq)

    # Normalize the cache to the STACKED folded layout [L, BN, S, D] with
    # the layer picked by a prefetched scalar: feeding a per-layer slice
    # (lax.scan xs) forces XLA to materialize a 100 MB dynamic-slice copy
    # per layer per forward (~18.6 ms/forward at 1.3B; measured).
    if k_cache.ndim == 4 and layer_idx is not None:
        kf4, vf4 = k_cache, v_cache          # [L, BN, S, D], pre-folded
    else:
        kf4 = _fold_kv(k_cache)[None]
        vf4 = _fold_kv(v_cache)[None]
        layer_idx = 0
    S = kf4.shape[2]
    kt_full = _cdiv(S, tk)
    ktc = kt_full
    n_sink_t = None
    if window_tiles is not None and sum(window_tiles) < kt_full:
        # compressed two-interval grid (windowed streaming): cache grid
        # steps cover only sinks + the recent window however large the
        # append buffer is — dead buffer tiles never enter the grid
        # (measured ~4.7 ms/block per excess tile at 1.3B; PERF.md r4)
        n_sink_t, n_recent_t = window_tiles
        ktc = n_sink_t + n_recent_t
    elif static_hi is not None:
        # static upper bound on the live window: size the grid to exactly
        # the live cache tiles (callers know the block index statically),
        # so dead tiles never enter the grid at all.  The operand stays
        # the full cache buffer — only the index space shrinks.
        ktc = min(ktc, _cdiv(max(int(static_hi), 1), tk)) \
            if static_hi > 0 else 0
    ktf = _cdiv(Lf, tf)

    if NH is not None:
        qf = _pad_to(q, 1, qt * tq)
        knf = _pad_to(k_new.astype(kf4.dtype), 1, ktf * tf)
        vnf = _pad_to(v_new.astype(vf4.dtype), 1, ktf * tf)
    else:
        qf = _pad_to(_fold_q(q), 1, qt * tq)
        knf = _pad_to(_fold_kv(k_new).astype(kf4.dtype), 1, ktf * tf)
        vnf = _pad_to(_fold_kv(v_new).astype(vf4.dtype), 1, ktf * tf)
    # operands stay full-size; static_hi only shrinks the index space
    kf4 = _pad_to(kf4, 2, kt_full * tk)
    vf4 = _pad_to(vf4, 2, kt_full * tk)

    li = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    lo = jnp.asarray(kv_start, jnp.int32).reshape(1)
    hi = jnp.asarray(kv_end, jnp.int32).reshape(1)
    sk = jnp.asarray(0 if sink_end is None else sink_end,
                     jnp.int32).reshape(1)
    m0a = jnp.asarray(m0, jnp.float32).reshape(1)

    if n_sink_t is not None:
        def cache_idx(b, ki, qi, li, lo, hi, sk, m0r):
            # compressed grid: step ki < n_sink reads buffer tile ki
            # (the sink region); later steps read the tiles covering
            # [lo, hi) — dead steps clamp into the live range so their
            # DMAs re-reference the resident block and are elided.
            # MUST match the kernel's kv_base computation exactly.
            lo_t = lo[0] // tk
            last = jnp.maximum((hi[0] - 1) // tk, lo_t)
            base = jnp.where(ki < n_sink_t, jnp.minimum(ki, kt_full - 1),
                             jnp.clip(lo_t + (ki - n_sink_t), lo_t, last))
            return (li[0], b, base, 0)
    else:
        def cache_idx(b, ki, qi, li, lo, hi, sk, m0r):
            # Clamp dead cache tiles into [lo, hi)'s tile range: dead
            # grid steps then re-reference the resident block and their
            # DMAs are elided (big win on early blocks where most of the
            # window is empty).  Sink tiles (ki*tk < sink_end — the
            # windowed-streaming two-interval window) pass through at
            # their own position.  max(ktc-1, 0): with static_hi=0 the
            # grid has NO cache steps but these maps still index the
            # operand's per-step DMA — ktc-1 == -1 through the sink
            # branch was an out-of-bounds block index (device crash; r4).
            first = lo[0] // tk
            last = jnp.maximum((hi[0] - 1) // tk, first)
            kc = jnp.minimum(ki, max(ktc - 1, 0))
            base = jnp.where(kc * tk < sk[0], kc, jnp.clip(kc, first, last))
            return (li[0], b, base, 0)

    if NH is not None:
        def q_idx(b, ki, qi, li, lo, hi, sk, m0r):
            return (b // NH, qi, b % NH)

        def fresh_idx(b, ki, qi, li, lo, hi, sk, m0r):
            return (b // NH, jnp.clip(ki - ktc, 0, ktf - 1), b % NH)
    else:
        def q_idx(b, ki, qi, li, lo, hi, sk, m0r):
            return (b, qi, 0)

        def fresh_idx(b, ki, qi, li, lo, hi, sk, m0r):
            return (b, jnp.clip(ki - ktc, 0, ktf - 1), 0)

    # free modes never touch the running-max scratch — dropping it frees
    # ~2.4 MB of persistent VMEM at 1.3B geometry for bigger tiles
    scratch = ([] if bounded in ("free", "free_qk")
               else [pltpu.VMEM((qt * tq, 128), jnp.float32)]) + [
        pltpu.VMEM((qt * tq, 128), jnp.float32),
        pltpu.VMEM((qt * tq, D), jnp.float32),
    ]
    if quant == "int8":
        if bounded == "free_qk":
            # free_qk also never quantizes V — drop vq_scr too
            def kernel(li_ref, lo_ref, hi_ref, sk_ref, m0_ref, q_ref,
                       k_ref, v_ref, kn_ref, vn_ref, o_ref, l_scr,
                       acc_scr, kq_scr, qq_scr, qs_scr, sc_scr):
                _decode_fresh_int8_kernel(
                    li_ref, lo_ref, hi_ref, sk_ref, m0_ref, q_ref, k_ref,
                    v_ref, kn_ref, vn_ref, o_ref, None, l_scr, acc_scr,
                    kq_scr, None, qq_scr, qs_scr, sc_scr, scale=scale,
                    tq=tq, tk=tk, tf=tf, kv_len=S, kt_cache=ktc,
                    fresh_len=Lf, bounded=bounded, n_sink_tiles=n_sink_t)
            scratch += [
                pltpu.VMEM((max(tk, tf), D), jnp.int8),  # quantized K tile
                pltpu.VMEM((qt * tq, D), jnp.int8),      # quantized Q
                pltpu.SMEM((qt,), jnp.float32),          # per-q-tile scales
                pltpu.SMEM((2,), jnp.float32),           # K scale
            ]
        else:
            kernel = functools.partial(
                _decode_fresh_int8_kernel, scale=scale, tq=tq, tk=tk,
                tf=tf, kv_len=S, kt_cache=ktc, fresh_len=Lf,
                bounded=bounded, n_sink_tiles=n_sink_t)
            scratch += [
                pltpu.VMEM((max(tk, tf), D), jnp.int8),  # quantized K tile
                pltpu.VMEM((max(tk, tf), D), jnp.int8),  # quantized V tile
                pltpu.VMEM((qt * tq, D), jnp.int8),      # quantized Q
                pltpu.SMEM((qt,), jnp.float32),          # per-q-tile scales
                pltpu.SMEM((2,), jnp.float32),           # per-tile K/V scales
            ]
    elif bounded == "free":
        def kernel(li_ref, lo_ref, hi_ref, sk_ref, m0_ref, q_ref, k_ref,
                   v_ref, kn_ref, vn_ref, o_ref, l_scr, acc_scr):
            _decode_fresh_kernel(li_ref, lo_ref, hi_ref, sk_ref, m0_ref,
                                 q_ref, k_ref, v_ref, kn_ref, vn_ref,
                                 o_ref, None, l_scr, acc_scr, scale=scale,
                                 tq=tq, tk=tk, tf=tf, kv_len=S,
                                 kt_cache=ktc, fresh_len=Lf,
                                 bounded=bounded, n_sink_tiles=n_sink_t)
    else:
        kernel = functools.partial(
            _decode_fresh_kernel, scale=scale, tq=tq, tk=tk, tf=tf,
            kv_len=S, kt_cache=ktc, fresh_len=Lf, bounded=bounded,
            n_sink_tiles=n_sink_t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(BN, ktc + ktf, qt),   # q innermost: KV streamed once
        in_specs=[
            pl.BlockSpec((1, tq, D), q_idx),
            pl.BlockSpec((1, 1, tk, D), cache_idx),
            pl.BlockSpec((1, 1, tk, D), cache_idx),
            pl.BlockSpec((1, tf, D), fresh_idx),
            pl.BlockSpec((1, tf, D), fresh_idx),
        ],
        out_specs=pl.BlockSpec((1, tq, D), q_idx),
        scratch_shapes=scratch,
    )
    out_shape = ((qf.shape[0], qt * tq, qf.shape[-1]) if NH is not None
                 else (BN, qt * tq, D))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, q.dtype),
        interpret=interpret,
    )(li, lo, hi, sk, m0a, qf, kf4, vf4, knf, vnf)
    if NH is not None:
        return out[:, :Lq]
    return _unfold_like_q(out[:, :Lq], q)


def _decode_fresh_dispatch(q, k_cache, v_cache, k_new, v_new, kv_start,
                           kv_end, sink_end, layer_idx, m0, scale, tq, tk,
                           tf, interpret, static_hi, quant=None,
                           heads_packed=None, bounded=False,
                           window_tiles=None):
    # (a dynamic-bound variant — grid (BN,) with an in-kernel fori_loop
    # and hand-rolled double-buffered DMA over exactly the live tiles —
    # was built and measured SLOWER at full window than this static-grid
    # kernel: Mosaic's managed multi-dim-grid pipelining wins.  Removed
    # in round 3; PERF.md records the numbers, git history the code.)
    return _decode_fresh_fwd(q, k_cache, v_cache, k_new, v_new, kv_start,
                             kv_end, sink_end, m0, scale, tq, tk, tf,
                             interpret, static_hi, quant, layer_idx,
                             heads_packed, bounded, window_tiles)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15,
                                                    16, 17, 18, 19))
def _decode_fresh_op(q, k_cache, v_cache, k_new, v_new, kv_start, kv_end,
                     sink_end, layer_idx, m0, scale, tq, tk, tf, interpret,
                     static_hi, quant, heads_packed, bounded, window_tiles):
    return _decode_fresh_dispatch(q, k_cache, v_cache, k_new, v_new,
                                  kv_start, kv_end, sink_end, layer_idx,
                                  m0, scale, tq, tk, tf, interpret,
                                  static_hi, quant, heads_packed, bounded,
                                  window_tiles)


def _decode_fresh_op_fwd(q, k_cache, v_cache, k_new, v_new, kv_start,
                         kv_end, sink_end, layer_idx, m0, scale, tq, tk,
                         tf, interpret, static_hi, quant, heads_packed,
                         bounded, window_tiles):
    out = _decode_fresh_dispatch(q, k_cache, v_cache, k_new, v_new,
                                 kv_start, kv_end, sink_end, layer_idx,
                                 m0, scale, tq, tk, tf, interpret,
                                 static_hi, quant, heads_packed, bounded,
                                 window_tiles)
    return out, (q, k_cache, v_cache, k_new, v_new, kv_start, kv_end,
                 sink_end, layer_idx)


def _decode_fresh_op_bwd(scale, tq, tk, tf, interpret, static_hi, quant,
                         heads_packed, bounded, window_tiles, res, g):
    """Backward through the XLA reference.  Folded 3-D operands are
    viewed as singleton-head 4-D (attention is head-batched, so
    [BN, S, 1, D] is numerically identical); grads come back in each
    operand's own layout."""
    from self_forcing_tpu.ops import attention as xla_attn
    (q, k_cache, v_cache, k_new, v_new, kv_start, kv_end, sink_end,
     layer_idx) = res
    if bounded in ("free", "free_noclamp", "free_qk"):
        # the forward computed softmax base-2 of (s * scale); the XLA
        # reference's base-e softmax matches at scale * ln(2)
        scale = scale * math.log(2.0)
    stacked = k_cache.ndim == 4 and layer_idx is not None
    folded_q = q.ndim == 3 and heads_packed is None

    def ref(q_, kc_, vc_, kn_, vn_):
        if stacked:
            kc_ = jax.lax.dynamic_index_in_dim(kc_, layer_idx, 0,
                                               keepdims=False)
            vc_ = jax.lax.dynamic_index_in_dim(vc_, layer_idx, 0,
                                               keepdims=False)
        if heads_packed is not None:
            # [B, L, N*D] column-packed view == [B, L, N, D] bitcast
            NH = heads_packed
            q_, kn_, vn_ = (a.reshape(*a.shape[:2], NH, a.shape[-1] // NH)
                            for a in (q_, kn_, vn_))
        if folded_q:
            q_, kn_, vn_ = q_[:, :, None], kn_[:, :, None], vn_[:, :, None]
        elif kn_.ndim == 3:
            N = q_.shape[2]
            kn_, vn_ = (xla_attn.unfold_kv(kn_, N),
                        xla_attn.unfold_kv(vn_, N))
        if kc_.ndim == 3:
            if folded_q:
                kc_, vc_ = kc_[:, :, None], vc_[:, :, None]
            else:
                N = q_.shape[2]
                kc_, vc_ = (xla_attn.unfold_kv(kc_, N),
                            xla_attn.unfold_kv(vc_, N))
        out = xla_attn.decode_attention_fresh_xla(
            q_, kc_, vc_, kn_, vn_, kv_start, kv_end, sink_end=sink_end,
            scale=scale)
        if heads_packed is not None:
            return out.reshape(*out.shape[:2], -1)
        return out[:, :, 0] if folded_q else out

    _, vjp = jax.vjp(ref, q, k_cache, v_cache, k_new, v_new)
    dq, dkc, dvc, dkn, dvn = vjp(g)
    # kv_start / kv_end / sink_end / layer_idx carry no gradient; m0 is
    # f32 so it needs an explicit zero cotangent (the output is
    # mathematically invariant to the softmax offset)
    return (dq, dkc, dvc, dkn, dvn, None, None, None, None,
            jnp.zeros((), jnp.float32))


_decode_fresh_op.defvjp(_decode_fresh_op_fwd, _decode_fresh_op_bwd)


def decode_attention_fresh_pallas(q: jax.Array, k_cache: jax.Array,
                                  v_cache: jax.Array, k_new: jax.Array,
                                  v_new: jax.Array, kv_start: jax.Array,
                                  kv_end: jax.Array,
                                  scale: Optional[float] = None,
                                  tq: int = 512, tk: int = 2048,
                                  interpret: bool = False,
                                  static_hi: Optional[int] = None,
                                  quant: Optional[str] = None,
                                  layer_idx: Optional[jax.Array] = None,
                                  heads_packed: Optional[int] = None,
                                  fixed_m0=None,
                                  softmax: Optional[str] = None,
                                  int8_bound: str = "tile",
                                  sink_end: Optional[jax.Array] = None,
                                  tk_align: Optional[int] = None,
                                  window_static: Optional[tuple] = None
                                  ) -> jax.Array:
    """Decode attention over cache[kv_start:kv_end) plus a fresh block of
    K/V that has not been written to the cache (read-only-cache fast path,
    models/wan/dit.py).  tq=512 halves the grid vs 256 (fewer dead-step
    iterations at early blocks; VMEM scratch stays ~8MB at Lq=4680).

    ``static_hi``: static upper bound on ``kv_end`` when the caller knows
    the block index at trace time (the AR pipeline's python loop) — the
    kernel grid is then sized to exactly the live cache tiles.

    ``quant='int8'``: run both attention matmuls on the MXU int8 path
    (demo-config speed toggle; see _decode_fresh_int8_kernel).
    ``int8_bound``: 'tile' (safe per-row within-tile quantization, the
    production default) or 'global' (quantize p against the global m0 —
    faster but truncates scores > ln(254) nats below the bound; kernel
    A/Bs only).

    ``sink_end``: i32 scalar — the cache window becomes the TWO-interval
    union [0, sink_end) + [kv_start, kv_end): the windowed-streaming
    path's attention-sink view (reference causal_model.py:203-229 keeps
    sinks by physically rolling; here the roll is unnecessary).
    ``tk_align``: align cache tiles to this granularity (the windowed
    caller passes frame_seqlen so interval bounds land on tile edges —
    every live tile then takes the mask-free fast path).
    ``window_static``: (sink_tokens, recent_tokens) static ints — sizes
    a COMPRESSED cache grid of only the sink + recent-window tiles, so
    grid cost is O(window) regardless of the append-buffer size
    (measured ~4.7 ms/block per excess buffer tile at 1.3B)."""
    D = q.shape[-1] if heads_packed is None else q.shape[-1] // heads_packed
    scale = (D ** -0.5) if scale is None else scale
    # A/B sweep overrides (scripts/bench_windowed.py & friends): the tile
    # heuristics below were swept at the FULL 32760-token window; these
    # let the e2e benches re-sweep at other geometries (e.g. the windowed
    # 20k-token live set) without forking the call chain.
    _tq_env = os.environ.get("SF_TPU_ATTN_TQ")
    _tk_env = os.environ.get("SF_TPU_ATTN_TK")
    if _tq_env:
        tq = int(_tq_env)
    if _tk_env:
        tk = int(_tk_env)
    if softmax in ("free", "free_noclamp") \
            and quant in (None, "int8qk") and tq == 512:
        # free mode drops the running-max scratch, which buys VMEM for
        # wider q tiles (fewer grid steps): the v5e sweep measured 6.58 ->
        # 6.12 ms/call at tq 472 -> 936 (full window, folded layout), but
        # the production heads-packed pipeline layout runs out of scoped
        # VMEM at 936 (16.12M > 16M) — 780 (qt=6 at Lq=4680) is the
        # largest tile that fits there.  PERF.md.
        # The WINDOWED path's frame-aligned cache tiles (tk_align ->
        # tk = frame_seqlen = 1560 < 2048) leave more VMEM: tq=936 fits
        # AND wins there (773 -> 765 ms/block e2e, round-5 sweep at the
        # 12f+sink windowed geometry).
        tq = 800 if tk_align is None else 960
    # exact-fit tiles: pick the tile count from the requested size, then
    # shrink the tile to cover the length with minimal padding (e.g.
    # Lq=4680 with tq=512 -> 10 tiles of 472 rows: 0.9% pad instead of
    # 9.4%; Lf=4680 with tk=2048 -> 3 fresh tiles of 1560: zero pad
    # instead of 31%).  Multiples of 8 sublanes keep Mosaic happy.
    Lq = q.shape[1]
    qt = _cdiv(Lq, min(tq, max(128, 1 << (Lq - 1).bit_length())))
    tq = max(8, -(-_cdiv(Lq, qt) // 8) * 8)
    # exact-fit the CACHE tile to S as well: an S no tile count covers
    # pad-free forces _decode_fresh_fwd to pad-COPY the entire cache
    # every call (~3.4 GB at a 12-frame window; the windowed path's
    # buffer size is semantically pinned to the window, so it cannot be
    # pre-aligned the way the global cache is)
    S_tok = k_cache.shape[2] if k_cache.ndim == 4 else k_cache.shape[1]
    if tk_align is not None and S_tok % tk_align == 0 \
            and tk_align % 8 == 0:
        # frame-aligned cache tiles (windowed path): the two-interval
        # window's bounds are whole frames, so aligned tiles are either
        # fully live (mask-free) or fully dead (DMA-elided)
        m = S_tok // tk_align
        d = max((x for x in range(1, m + 1)
                 if m % x == 0 and x * tk_align <= max(tk, tk_align)),
                default=1)
        tk = d * tk_align
    elif S_tok % tk:
        ntk = _cdiv(S_tok, min(tk, max(128, 1 << (S_tok - 1).bit_length())))
        tk = max(8, -(-_cdiv(S_tok, ntk) // 8) * 8)
    Lf = k_new.shape[1]
    # int8 scratch tiles are (32, 128)-tiled (tf 32-aligned), and the
    # extra qq scratch leaves less VMEM for operand double-buffers: cap
    # the fresh tile at 1280 there (4x1184 instead of 3x1568 at Lf=4680;
    # the 16 MB scoped-VMEM limit was exceeded by 50 KB otherwise)
    # int8qk (free_qk) drops the V-quant scratch, so the full-int8 cap
    # relaxes to 1600 (3x1560 zero-pad fresh tiles at Lf=4680 instead of
    # 4x1184; A/B'd on v5e)
    cap = (min(tk, 1280) if quant == "int8"
           else min(tk, 1600) if quant == "int8qk" else tk)
    ntf = _cdiv(Lf, min(cap, max(128, 1 << (Lf - 1).bit_length())))
    gran = 32 if quant in ("int8", "int8qk") else 8
    tf = max(gran, -(-_cdiv(Lf, ntf) // gran) * gran)
    li = None if layer_idx is None else jnp.asarray(layer_idx, jnp.int32)
    sk = jnp.asarray(0 if sink_end is None else sink_end, jnp.int32)
    wt = None
    if window_static is not None:
        sink_tok, recent_tok = window_static
        # +1 recent tile when interval bounds may straddle tile edges
        # (with tk == frame_seqlen every bound is tile-aligned)
        extra = 0 if (sink_tok % tk == 0 and recent_tok % tk == 0
                      and tk_align is not None and tk % tk_align == 0
                      and tk // tk_align == 1) else 1
        wt = (_cdiv(sink_tok, tk), _cdiv(recent_tok, tk) + extra)
    if softmax in ("free", "free_noclamp"):
        # offset-free base-2 softmax (see _decode_fresh_kernel): the
        # caller has pre-folded scale*log2(e) into q (or passes it via
        # ``scale``); 'free' carries the in-kernel overflow clamp.
        if quant == "int8qk":
            # int8 QK / bf16 PV on the free path (_decode_fresh_int8_kernel
            # free_qk mode): p never quantizes, so no bound is needed
            return _decode_fresh_op(q, k_cache, v_cache, k_new, v_new,
                                    jnp.asarray(kv_start, jnp.int32),
                                    jnp.asarray(kv_end, jnp.int32), sk, li,
                                    jnp.asarray(0.0, jnp.float32),
                                    scale, tq, tk, tf, interpret,
                                    static_hi, "int8", heads_packed,
                                    "free_qk", wt)
        assert quant is None, "free softmax is a bf16-path mode"
        return _decode_fresh_op(q, k_cache, v_cache, k_new, v_new,
                                jnp.asarray(kv_start, jnp.int32),
                                jnp.asarray(kv_end, jnp.int32), sk, li,
                                jnp.asarray(0.0, jnp.float32),
                                scale, tq, tk, tf, interpret, static_hi,
                                None, heads_packed, softmax, wt)
    bounded = fixed_m0 is not None
    if bounded and quant == "int8":
        # int8 p-quantization against the global m0 truncates scores
        # > ln(254) nats below the bound (unshippable cliff); default to
        # the safe per-tile-max variant, keep 'global' for kernel A/Bs.
        assert int8_bound in ("tile", "global"), int8_bound
        bounded = int8_bound
    m0 = jnp.asarray(0.0 if fixed_m0 is None else fixed_m0, jnp.float32)
    return _decode_fresh_op(q, k_cache, v_cache, k_new, v_new,
                            jnp.asarray(kv_start, jnp.int32),
                            jnp.asarray(kv_end, jnp.int32), sk, li, m0,
                            scale, tq, tk, tf, interpret, static_hi,
                            quant, heads_packed, bounded, wt)


# =====================================================================
# cross attention: small static KV (512 text / 257 CLIP-image tokens)
# =====================================================================

def _cross_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                  kv_len: int, kv_pad: int):
    """Single-pass softmax(q k^T) v per (bn, q-tile): the whole KV fits
    one tile, so there is no online-softmax state.  Replaces the XLA
    einsum+softmax path, which materializes the [N, Lq, Lk] f32 score and
    probability tensors in HBM (~115 MB/layer at 1.3B geometry —
    trace-measured 0.35 ms/layer where the FLOPs cost ~0.13 ms)."""
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_len < kv_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p, v_ref[0].astype(jnp.float32),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0] = (pv / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _cross_fwd(q, k, v, scale, tq, interpret, heads_packed=None):
    Lk = k.shape[1]
    Lq = q.shape[1]
    if heads_packed is not None:
        # q/out keep the natural [B, Lq, N*D] layout; the BlockSpec picks
        # head n as a 128-wide column block (no transpose in the graph)
        NH = heads_packed
        B = q.shape[0]
        D = q.shape[-1] // NH
        BN = B * NH
        qf = _pad_to(q, 1, _cdiv(Lq, tq) * tq)
        q_spec = pl.BlockSpec((1, tq, D), lambda b, qi: (b // NH, qi, b % NH))
    else:
        B, Lq, N, D = q.shape
        BN = B * N
        qf = _pad_to(q.transpose(0, 2, 1, 3).reshape(BN, Lq, D), 1,
                     _cdiv(Lq, tq) * tq)
        q_spec = pl.BlockSpec((1, tq, D), lambda b, qi: (b, qi, 0))
    qt = _cdiv(Lq, tq)
    kv_pad = max(128, _cdiv(Lk, 128) * 128)

    kf = _pad_to(k.transpose(0, 2, 1, 3).reshape(BN, Lk, D), 1, kv_pad)
    vf = _pad_to(v.transpose(0, 2, 1, 3).reshape(BN, Lk, D), 1, kv_pad)

    out_shape = ((B, qt * tq, q.shape[-1]) if heads_packed is not None
                 else (BN, qt * tq, D))
    out = pl.pallas_call(
        functools.partial(_cross_kernel, scale=scale, kv_len=Lk,
                          kv_pad=kv_pad),
        grid=(BN, qt),
        in_specs=[
            q_spec,
            pl.BlockSpec((1, kv_pad, D), lambda b, qi: (b, 0, 0)),
            pl.BlockSpec((1, kv_pad, D), lambda b, qi: (b, 0, 0)),
        ],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    if heads_packed is not None:
        return out[:, :Lq]
    return out[:, :Lq].reshape(B, N, Lq, D).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _cross_op(q, k, v, scale, tq, interpret, heads_packed):
    return _cross_fwd(q, k, v, scale, tq, interpret, heads_packed)


def _cross_op_fwd(q, k, v, scale, tq, interpret, heads_packed):
    return _cross_fwd(q, k, v, scale, tq, interpret, heads_packed), (q, k, v)


def _cross_op_bwd(scale, tq, interpret, heads_packed, res, g):
    from self_forcing_tpu.ops import attention as xla_attn
    q, k, v = res

    def ref(q_, k_, v_):
        if heads_packed is not None:
            q4 = q_.reshape(*q_.shape[:2], heads_packed,
                            q_.shape[-1] // heads_packed)
            out = xla_attn.dense_attention(q4, k_, v_, scale=scale)
            return out.reshape(*out.shape[:2], -1)
        return xla_attn.dense_attention(q_, k_, v_, scale=scale)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


_cross_op.defvjp(_cross_op_fwd, _cross_op_bwd)


def cross_attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                           scale: Optional[float] = None, tq: int = 512,
                           interpret: bool = False,
                           heads_packed: Optional[int] = None) -> jax.Array:
    """softmax(q k^T) v with a small static KV (cross-attention).

    q: [B, Lq, N, D]; k/v: [B, Lk, N, D] with Lk <= ~1024 (whole KV in
    one VMEM tile).  ``heads_packed=N``: q/out are [B, Lq, N*D]
    column-packed (no transpose around the call)."""
    D = (q.shape[-1] if heads_packed is None
         else q.shape[-1] // heads_packed)
    scale = (D ** -0.5) if scale is None else scale
    Lq = q.shape[1]
    qt = _cdiv(Lq, min(tq, max(128, 1 << (Lq - 1).bit_length())))
    tq = max(8, -(-_cdiv(Lq, qt) // 8) * 8)
    return _cross_op(q, k, v, scale, tq, interpret, heads_packed)


# =====================================================================
# masked flash attention (training): IntervalMask block-sparse
# =====================================================================


def _tile_states(s1n, e1n, s2n, e2n, Lq, Lk, tq, tk, qt, kt):
    """Host-precomputed per-tile state: 0 = dead (skip), 1 = partial
    (mask needed), 2 = fully visible (mask-free fast path — the mask's
    iota/compare/select chain is ~25% of the kernel's VPU work)."""
    states = np.zeros((qt, kt), np.int32)
    for i in range(qt):
        rows = slice(i * tq, min(i * tq + tq, Lq))
        if rows.stop <= rows.start:
            continue
        a1, b1 = s1n[rows], e1n[rows]
        a2, b2 = s2n[rows], e2n[rows]
        lo1, hi1 = a1.min(), b1.max()
        lo2, hi2 = a2.min(), b2.max()
        has_pad_rows = (i * tq + tq) > Lq
        for j in range(kt):
            a, b = j * tk, (j + 1) * tk
            if not ((a < hi1 and b > lo1) or (a < hi2 and b > lo2)):
                continue
            full = (not has_pad_rows and b <= Lk
                    and bool(np.all(((a1 <= a) & (b1 >= b))
                                    | ((a2 <= a) & (b2 >= b)))))
            states[i, j] = 2 if full else 1
    return states


def _flash_kernel(tile_live_ref, m0_ref, s1_ref, e1_ref, s2_ref, e2_ref,
                  q_ref, k_ref, v_ref, o_ref, lse_ref,
                  m_scr, l_scr, acc_scr, *, scale: float, tk: int,
                  kv_len: int, bounded: bool = False):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        if not bounded:
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    state = tile_live_ref[qi, ki]

    def _compute(masked):
        if bounded == "free":
            # OFFSET-FREE base-2 softmax (see _decode_fresh_kernel): the
            # caller pre-folded scale*log2(e) into q, p = 2^s with a
            # one-op overflow clamp.  The lse contract stays base-e: with
            # l = sum(2^s2), ln(l) = ln2 * log2(l), and the backward
            # recomputes p = exp(ln2*s2 - ln(l)) = 2^(s2 - lse2) exactly
            # when invoked at scale = ln(2) (flash_attention_pallas does).
            s = jax.lax.dot_general(
                q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif bounded:
            # BOUNDED-offset softmax (same trick as _decode_fresh_kernel):
            # m0 >= max score over the whole sequence, so exp(s - m0) is
            # exact softmax and the running-max correction chain is dead
            # VPU work; the bwd kernels already recompute p from lse, and
            # lse = m0 + log(l) below keeps that contract exact.
            s = jax.lax.dot_general(
                q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        else:
            q = q_ref[0].astype(jnp.float32) * scale
            k = k_ref[0].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [TQ, TK]
        tq = q_ref.shape[1]
        if masked:
            col = ki * tk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            row0 = pl.multiple_of(qi * tq, tq)
            s1 = s1_ref[0, pl.ds(row0, tq)][:, None]
            e1 = e1_ref[0, pl.ds(row0, tq)][:, None]
            s2 = s2_ref[0, pl.ds(row0, tq)][:, None]
            e2 = e2_ref[0, pl.ds(row0, tq)][:, None]
            vis = (((col >= s1) & (col < e1)) | ((col >= s2) & (col < e2)))
            vis = vis & (col < kv_len)
            s = jnp.where(vis, s, NEG_INF)

        if bounded:
            if bounded == "free":
                p = jnp.exp2(jnp.minimum(s, 80.0))
            else:
                p = jnp.exp(s - m0_ref[0])
            l_scr[:, 0:1] = l_scr[:, 0:1] + jnp.sum(p, axis=-1,
                                                    keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_scr[:] = acc_scr[:] + pv
            return

        m_prev = m_scr[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_scr[:, 0:1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0].astype(jnp.float32)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * corr + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(state == 1)
    def _masked():
        _compute(True)

    @pl.when(state == 2)
    def _full():
        _compute(False)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:, 0:1]
        o_ref[0] = (acc_scr[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        # logsumexp rows (0 where the row saw nothing -> exp(-inf-0)=0
        # downstream); lane-broadcast layout for Mosaic-safe stores
        m_fin = m0_ref[0] if bounded else m_scr[:, 0:1]
        lse = jnp.where(l > 0, m_fin + jnp.log(jnp.maximum(l, 1e-30)),
                        0.0)
        lse_ref[0] = jnp.broadcast_to(lse, (lse.shape[0], 128))


def _flash_fwd(q, k, v, s1, e1, s2, e2, scale, tq, tk, interpret,
               m0=None, bounded=False):
    """s1..e2: [Lq] i32 numpy-backed device arrays (static mask).
    ``m0``: f32 score upper bound, used when ``bounded`` (static) — the
    bounded-offset softmax mode (see _flash_kernel)."""
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    BN = B * N
    qt = _cdiv(Lq, tq)
    kt = _cdiv(Lk, tk)

    qf = _pad_to(q.transpose(0, 2, 1, 3).reshape(BN, Lq, D), 1, qt * tq)
    kf = _pad_to(k.transpose(0, 2, 1, 3).reshape(BN, Lk, D), 1, kt * tk)
    vf = _pad_to(v.transpose(0, 2, 1, 3).reshape(BN, Lk, D), 1, kt * tk)

    # host-precomputed tri-state tile table (dead/partial/fully-visible)
    s1n, e1n = np.asarray(s1), np.asarray(e1)
    s2n, e2n = np.asarray(s2), np.asarray(e2)
    tile_live = _tile_states(s1n, e1n, s2n, e2n, Lq, Lk, tq, tk, qt, kt)

    # pad interval arrays to [1, qt*tq]; passed as full-array VMEM blocks
    # (last-two-dims rule) and sliced per q-tile inside the kernel.
    def prep(x):
        xp = np.zeros(qt * tq, np.int32)
        xp[:Lq] = x
        return jnp.asarray(xp.reshape(1, qt * tq))

    iv_spec = pl.BlockSpec((1, qt * tq), lambda b, qi, ki, tl, m: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BN, qt, kt),
        in_specs=[
            iv_spec,
            iv_spec,
            iv_spec,
            iv_spec,
            pl.BlockSpec((1, tq, D), lambda b, qi, ki, tl, m: (b, qi, 0)),
            pl.BlockSpec((1, tk, D), lambda b, qi, ki, tl, m: (b, ki, 0)),
            pl.BlockSpec((1, tk, D), lambda b, qi, ki, tl, m: (b, ki, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tq, D), lambda b, qi, ki, tl, m: (b, qi, 0)),
            pl.BlockSpec((1, tq, 128), lambda b, qi, ki, tl, m: (b, qi, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, D), jnp.float32),
        ],
    )
    m0a = jnp.asarray(0.0 if m0 is None else m0, jnp.float32).reshape(1)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, tk=tk, kv_len=Lk,
                          bounded=bounded),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((BN, qt * tq, D), q.dtype),
                   jax.ShapeDtypeStruct((BN, qt * tq, 128), jnp.float32)),
        interpret=interpret,
    )(jnp.asarray(tile_live), m0a, prep(s1n), prep(e1n), prep(s2n),
      prep(e2n), qf, kf, vf)
    return (out[:, :Lq].reshape(B, N, Lq, D).transpose(0, 2, 1, 3),
            lse[:, :, 0])  # [BN, qt*tq]


def flash_attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                           mask: IntervalMask | None = None,
                           scale: Optional[float] = None,
                           tq: int = 512, tk: int = 2048,
                           interpret: bool = False,
                           fixed_m0=None,
                           softmax: Optional[str] = None) -> jax.Array:
    """Same signature/semantics as ops.attention.flash_attention.

    The mask's interval arrays must be host-known (they always are: mask
    geometry is static — ops/masks.py builds them with numpy).  Default
    tiles tuned on v5e at the 21-frame training geometry (L=32760,
    block-causal): ~75 effective TFLOP/s vs ~15 for the XLA reference (5x).

    ``softmax='free'``: offset-free base-2 softmax — the caller has
    pre-folded ``head_dim**-0.5 * log2(e)`` into q; the backward runs at
    scale=ln(2) against the base-e lse the forward emits (exact; see
    _flash_kernel).  Mutually exclusive with ``fixed_m0``.
    """
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    free = softmax == "free"
    if free:
        assert fixed_m0 is None
        scale = 1.0
    else:
        scale = (D ** -0.5) if scale is None else scale
    if mask is None:
        s1 = np.zeros(Lq, np.int32)
        e1 = np.full(Lq, Lk, np.int32)
        s2 = np.zeros(Lq, np.int32)
        e2 = np.zeros(Lq, np.int32)
    else:
        s1 = np.asarray(mask.start1)[:Lq]
        e1 = np.asarray(mask.end1)[:Lq]
        s2 = np.asarray(mask.start2)[:Lq]
        e2 = np.asarray(mask.end2)[:Lq]

    tq = min(tq, max(128, 1 << (Lq - 1).bit_length()))
    tk = min(tk, max(128, 1 << (Lk - 1).bit_length()))

    # backward tiles (v5e sweep at L=32760 block-causal: 512/2048 -> 66
    # effective TF/s; XLA's attention backward OOMs at this geometry).
    btq = min(512, tq)
    btk = min(2048, tk)

    bounded = "free" if free else fixed_m0 is not None
    # free mode: fwd p = 2^(s2) with lse = ln(sum 2^s2); the bwd kernels
    # then recompute p = exp(ln2*s2 - lse) = 2^(s2 - lse2) exactly, and
    # their dq/dk scale factor ln2 is the base-2 chain rule.
    bwd_scale = math.log(2.0) if free else scale

    @functools.partial(jax.custom_vjp)
    def op(q_, k_, v_, m0_):
        return _flash_fwd(q_, k_, v_, s1, e1, s2, e2, scale, tq, tk,
                          interpret, m0=m0_, bounded=bounded)[0]

    def op_fwd(q_, k_, v_, m0_):
        out, lse = _flash_fwd(q_, k_, v_, s1, e1, s2, e2, scale, tq, tk,
                              interpret, m0=m0_, bounded=bounded)
        return out, (q_, k_, v_, out, lse)

    def op_bwd(res, g):
        q_, k_, v_, out, lse = res
        dq, dk, dv = _flash_bwd(q_, k_, v_, out, lse, g, s1, e1, s2, e2,
                                bwd_scale, btq, btk, interpret)
        # the output is mathematically invariant to the softmax offset
        return dq, dk, dv, jnp.zeros((), jnp.float32)

    op.defvjp(op_fwd, op_bwd)
    return op(q, k, v, jnp.asarray(0.0 if fixed_m0 is None else fixed_m0,
                                   jnp.float32))


# =====================================================================
# flash attention backward kernels (training): dq and dk/dv
# =====================================================================

def _flash_bwd_dq_kernel(tile_live_ref, s1_ref, e1_ref, s2_ref, e2_ref,
                         q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
                         dq_ref, dq_scr, *, scale: float, tk: int,
                         kv_len: int):
    """Grid (BN, QT, KT), kv innermost; dq accumulated in scratch."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    state = tile_live_ref[qi, ki]

    def _compute(masked):
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        tq = q.shape[0]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [TQ, TK]
        row0 = pl.multiple_of(qi * tq, tq)
        if masked:
            col = ki * tk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s1 = s1_ref[0, pl.ds(row0, tq)][:, None]
            e1 = e1_ref[0, pl.ds(row0, tq)][:, None]
            s2 = s2_ref[0, pl.ds(row0, tq)][:, None]
            e2 = e2_ref[0, pl.ds(row0, tq)][:, None]
            vis = ((((col >= s1) & (col < e1)) | ((col >= s2) & (col < e2)))
                   & (col < kv_len))
            s = jnp.where(vis, s, NEG_INF)
        lse = lse_ref[0, 0, pl.ds(row0, tq)][:, None]
        p = jnp.exp(s - lse)                              # [TQ, TK]
        do = do_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [TQ, TK]
        delta = dl_ref[0, 0, pl.ds(row0, tq)][:, None]
        ds = p * (dp - delta)
        dq_scr[:] += scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(state == 1)
    def _masked():
        _compute(True)

    @pl.when(state == 2)
    def _full():
        _compute(False)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(tile_live_ref, s1_ref, e1_ref, s2_ref, e2_ref,
                          q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
                          dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float,
                          tq: int, tk: int, kv_len: int):
    """Grid (BN, KT, QT), q innermost; dk/dv accumulated in scratch."""
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    state = tile_live_ref[qi, ki]

    def _compute(masked):
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [TQ, TK]
        row0 = pl.multiple_of(qi * tq, tq)
        if masked:
            col = ki * tk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s1 = s1_ref[0, pl.ds(row0, tq)][:, None]
            e1 = e1_ref[0, pl.ds(row0, tq)][:, None]
            s2 = s2_ref[0, pl.ds(row0, tq)][:, None]
            e2 = e2_ref[0, pl.ds(row0, tq)][:, None]
            vis = ((((col >= s1) & (col < e1)) | ((col >= s2) & (col < e2)))
                   & (col < kv_len))
            s = jnp.where(vis, s, NEG_INF)
        lse = lse_ref[0, 0, pl.ds(row0, tq)][:, None]
        p = jnp.exp(s - lse)
        do = do_ref[0].astype(jnp.float32)
        # dv += p^T do
        dv_scr[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [TK, D]
        v = v_ref[0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = dl_ref[0, 0, pl.ds(row0, tq)][:, None]
        ds = p * (dp - delta)
        # dk += scale * ds^T q
        dk_scr[:] += scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(state == 1)
    def _masked():
        _compute(True)

    @pl.when(state == 2)
    def _full():
        _compute(False)

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, out, lse, g, s1, e1, s2, e2, scale, tq, tk,
               interpret):
    """Pallas flash backward: returns (dq, dk, dv).

    tq/tk here are the BACKWARD tiles (smaller than forward: three
    [TQ, TK] f32 temporaries live at once).
    """
    B, Lq, N, D = q.shape
    Lk = k.shape[1]
    BN = B * N
    qt = _cdiv(Lq, tq)
    kt = _cdiv(Lk, tk)
    Sq = qt * tq

    qf = _pad_to(q.transpose(0, 2, 1, 3).reshape(BN, Lq, D), 1, Sq)
    kf = _pad_to(k.transpose(0, 2, 1, 3).reshape(BN, Lk, D), 1, kt * tk)
    vf = _pad_to(v.transpose(0, 2, 1, 3).reshape(BN, Lk, D), 1, kt * tk)
    gf = _pad_to(g.transpose(0, 2, 1, 3).reshape(BN, Lq, D), 1, Sq)
    # delta = rowsum(dout * out)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)                               # [B, Lq, N]
    delta = _pad_to(delta.transpose(0, 2, 1).reshape(BN, Lq), 1, Sq)
    delta = delta[:, None, :]                             # [BN, 1, Sq]
    lse = _pad_to(lse[:, :Lq], 1, Sq)[:, None, :]  # fwd->bwd tiles, [BN,1,Sq]

    s1n, e1n = np.asarray(s1), np.asarray(e1)
    s2n, e2n = np.asarray(s2), np.asarray(e2)
    tile_live = _tile_states(s1n, e1n, s2n, e2n, Lq, Lk, tq, tk, qt, kt)

    def prep(x):
        xp = np.zeros(Sq, np.int32)
        xp[:Lq] = x
        return jnp.asarray(xp.reshape(1, Sq))

    iv = [prep(a) for a in (s1n, e1n, s2n, e2n)]
    iv_spec = pl.BlockSpec((1, Sq), lambda *a: (0, 0))

    def bn_row_spec():
        return pl.BlockSpec((1, 1, Sq), lambda b, i, j, tl: (b, 0, 0))

    # ---- dq: grid (BN, qt, kt)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, tk=tk,
                          kv_len=Lk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BN, qt, kt),
            in_specs=[
                iv_spec, iv_spec, iv_spec, iv_spec,
                pl.BlockSpec((1, tq, D), lambda b, qi, ki, tl: (b, qi, 0)),
                pl.BlockSpec((1, tk, D), lambda b, qi, ki, tl: (b, ki, 0)),
                pl.BlockSpec((1, tk, D), lambda b, qi, ki, tl: (b, ki, 0)),
                pl.BlockSpec((1, tq, D), lambda b, qi, ki, tl: (b, qi, 0)),
                bn_row_spec(),
                bn_row_spec(),
            ],
            out_specs=pl.BlockSpec((1, tq, D),
                                   lambda b, qi, ki, tl: (b, qi, 0)),
            scratch_shapes=[pltpu.VMEM((tq, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((BN, Sq, D), q.dtype),
        interpret=interpret,
    )(jnp.asarray(tile_live), *iv, qf, kf, vf, gf, lse, delta)

    # ---- dk/dv: grid (BN, kt, qt)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, tq=tq, tk=tk,
                          kv_len=Lk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BN, kt, qt),
            in_specs=[
                iv_spec, iv_spec, iv_spec, iv_spec,
                pl.BlockSpec((1, tq, D), lambda b, ki, qi, tl: (b, qi, 0)),
                pl.BlockSpec((1, tk, D), lambda b, ki, qi, tl: (b, ki, 0)),
                pl.BlockSpec((1, tk, D), lambda b, ki, qi, tl: (b, ki, 0)),
                pl.BlockSpec((1, tq, D), lambda b, ki, qi, tl: (b, qi, 0)),
                bn_row_spec(),
                bn_row_spec(),
            ],
            out_specs=(
                pl.BlockSpec((1, tk, D), lambda b, ki, qi, tl: (b, ki, 0)),
                pl.BlockSpec((1, tk, D), lambda b, ki, qi, tl: (b, ki, 0)),
            ),
            scratch_shapes=[pltpu.VMEM((tk, D), jnp.float32),
                            pltpu.VMEM((tk, D), jnp.float32)],
        ),
        out_shape=(jax.ShapeDtypeStruct((BN, kt * tk, D), k.dtype),
                   jax.ShapeDtypeStruct((BN, kt * tk, D), v.dtype)),
        interpret=interpret,
    )(jnp.asarray(tile_live), *iv, qf, kf, vf, gf, lse, delta)

    dq = dq[:, :Lq].reshape(B, N, Lq, D).transpose(0, 2, 1, 3)
    dk = dk[:, :Lk].reshape(B, N, Lk, D).transpose(0, 2, 1, 3)
    dv = dv[:, :Lk].reshape(B, N, Lk, D).transpose(0, 2, 1, 3)
    return dq, dk, dv
