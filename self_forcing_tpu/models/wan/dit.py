"""Wan2.1 DiT — bidirectional and block-causal — TPU-native.

Functional re-design of the reference's ``WanModel``
(wan/modules/model.py:497-923) and ``CausalWanModel``
(wan/modules/causal_model.py:370-1128):

- Parameters are a plain pytree; the 30 transformer blocks are *stacked*
  along a leading axis and executed with ``lax.scan`` — one compiled block,
  minimal code size, XLA pipelines the weight fetches.
- The per-layer KV cache is a single static-shape array pair
  ``[L, B, S, N, Dh]`` carried through the scan; cache indices
  (``local_end``/``global_end``, causal_model.py:202-236) are traced i32
  scalars so the whole chunk-wise autoregressive loop can itself be a scan.
- The Conv3d patch embedding with kernel==stride (model.py:583-584) is
  algebraically a reshape + matmul, which is how the MXU wants it.
- AdaLN modulation is per-frame ([B, F, 6, D], causal_model.py:307-320);
  the bidirectional model is the F-broadcast special case, so one block
  implementation serves both models.
- Cross-attention K/V over the 512 text tokens are precomputed once per
  prompt (``precompute_context``) instead of the reference's lazily-filled
  crossattn_cache (model.py:174-183).

Tensor layout: videos are [B, F, C, H, W] at the API boundary (matching the
reference pipelines), tokens are [B, L, D] inside.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables, sinusoidal_embedding_1d
from self_forcing_tpu.ops.attention import dense_attention, flash_attention
from self_forcing_tpu.ops.masks import IntervalMask

Params = dict  # nested dict pytree of jnp arrays

LOG2E = 1.4426950408889634  # offset-free softmax works in base 2


# =====================================================================
# primitives
# =====================================================================

def linear(p: Params, x: jax.Array) -> jax.Array:
    """x @ w + b, with optional fused LoRA delta (utils/lora.py:12-50) and
    optional quantization (ops/quant.py — the demo FP8 toggle,
    demo.py:277-283): 'w_q' = weight-only int8, 'w_qa' = dynamic-
    activation W8A8 on the MXU's native int8 path (2.17x bf16 measured
    on v5e), 'w_f8' = dynamic-activation e4m3 fp8 (v6e-native)."""
    if "w_q" in p or "w_qa" in p or "w_f8" in p:
        from self_forcing_tpu.ops.quant import quantized_linear
        return quantized_linear(p, x)
    out = x @ p["w"]
    if "b" in p:
        out = out + p["b"]
    if "lora_A" in p:
        out = out + ((x @ p["lora_A"]) @ p["lora_B"]) * p["lora_scale"]
    return out


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """WanRMSNorm (model.py:70-86): fp32 norm, cast back, scale."""
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return n.astype(x.dtype) * weight.astype(x.dtype)


def _qk_rms_norm(x: jax.Array, weight: jax.Array,
                 cfg: WanConfig) -> jax.Array:
    """q/k RMSNorm.  The reference normalizes over the FULL packed dim
    (model.py:70-86 applied before the head split), so under tensor
    parallelism — x holding only this device's head columns — the
    sum-of-squares is psum'd over the tp axis (one [.., 1] f32 psum)."""
    if cfg.tp_axis is None:
        return rms_norm(x, weight, cfg.eps)
    xf = x.astype(jnp.float32)
    tp = jax.lax.psum(1, cfg.tp_axis)
    ss = jax.lax.psum(jnp.sum(xf * xf, axis=-1, keepdims=True), cfg.tp_axis)
    n = xf * jax.lax.rsqrt(ss / (x.shape[-1] * tp) + cfg.eps)
    return n.astype(x.dtype) * weight.astype(x.dtype)


def _out_linear(p: Params, x: jax.Array, cfg: WanConfig) -> jax.Array:
    """Row-sharded output projection (attention o / ffn fc2): under tensor
    parallelism each device holds a row shard of w, so partial products
    are psum'd over the tp axis and the (replicated) bias is added once
    after the reduce."""
    if cfg.tp_axis is None:
        return linear(p, x)
    out = jax.lax.psum(x @ p["w"], cfg.tp_axis)
    if "b" in p:
        out = out + p["b"]
    if "lora_A" in p:
        out = out + jax.lax.psum((x @ p["lora_A"]) @ p["lora_B"],
                                 cfg.tp_axis) * p["lora_scale"]
    return out


def layer_norm(x: jax.Array, eps: float = 1e-6,
               weight: jax.Array | None = None,
               bias: jax.Array | None = None) -> jax.Array:
    """WanLayerNorm (model.py:89-99): fp32 stats, cast back."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    n = ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    if weight is not None:
        n = n * weight.astype(x.dtype) + bias.astype(x.dtype)
    return n


def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


# =====================================================================
# parameter init
# =====================================================================

def _linear_init(key, d_in, d_out, dtype, zero=False, std=None, bias=True):
    if zero:
        w = jnp.zeros((d_in, d_out), dtype)
    elif std is not None:
        w = (jax.random.normal(key, (d_in, d_out)) * std).astype(dtype)
    else:  # xavier uniform (model.py:907-911)
        lim = math.sqrt(6.0 / (d_in + d_out))
        w = jax.random.uniform(key, (d_in, d_out), dtype, -lim, lim)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _attn_init(key, cfg: WanConfig, cross: bool, dtype) -> Params:
    ks = jax.random.split(key, 6)
    d = cfg.dim
    p = {
        "q": _linear_init(ks[0], d, d, dtype),
        "k": _linear_init(ks[1], d, d, dtype),
        "v": _linear_init(ks[2], d, d, dtype),
        "o": _linear_init(ks[3], d, d, dtype),
    }
    if cfg.qk_norm:
        p["norm_q"] = {"w": jnp.ones((d,), dtype)}
        p["norm_k"] = {"w": jnp.ones((d,), dtype)}
    if cross and cfg.model_type == "i2v":
        p["k_img"] = _linear_init(ks[4], d, d, dtype)
        p["v_img"] = _linear_init(ks[5], d, d, dtype)
        if cfg.qk_norm:
            p["norm_k_img"] = {"w": jnp.ones((d,), dtype)}
    return p


def _block_init(key, cfg: WanConfig, dtype) -> Params:
    ks = jax.random.split(key, 5)
    d = cfg.dim
    p = {
        "self_attn": _attn_init(ks[0], cfg, False, dtype),
        "cross_attn": _attn_init(ks[1], cfg, True, dtype),
        "ffn": {
            "fc1": _linear_init(ks[2], d, cfg.ffn_dim, dtype),
            "fc2": _linear_init(ks[3], cfg.ffn_dim, d, dtype),
        },
        "modulation": (jax.random.normal(ks[4], (1, 6, d)) / d ** 0.5).astype(dtype),
    }
    if cfg.cross_attn_norm:
        p["norm3"] = {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}
    return p


def init_params(key: jax.Array, cfg: WanConfig,
                dtype=jnp.bfloat16, causal: bool = True) -> Params:
    """Initialize a Wan DiT parameter pytree (blocks stacked on axis 0)."""
    ks = jax.random.split(key, 12)
    d = cfg.dim
    patch_in = cfg.in_dim * int(np.prod(cfg.patch_size))
    params: Params = {
        "patch_embedding": _linear_init(ks[0], patch_in, d, dtype),
        "text_embedding": {
            "fc1": _linear_init(ks[1], cfg.text_dim, d, dtype, std=0.02),
            "fc2": _linear_init(ks[2], d, d, dtype, std=0.02),
        },
        "time_embedding": {
            "fc1": _linear_init(ks[3], cfg.freq_dim, d, dtype, std=0.02),
            "fc2": _linear_init(ks[4], d, d, dtype, std=0.02),
        },
        "time_projection": {"fc": _linear_init(ks[5], d, d * 6, dtype)},
        "head": {
            "head": _linear_init(
                ks[6], d, cfg.out_dim * int(np.prod(cfg.patch_size)), dtype,
                zero=True),  # zero-init output layer (model.py:923)
            "modulation": (jax.random.normal(ks[7], (1, 2, d)) / d ** 0.5).astype(dtype),
        },
    }
    block_keys = jax.random.split(ks[8], cfg.num_layers)
    blocks = [_block_init(k, cfg, dtype) for k in block_keys]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    if cfg.model_type == "i2v":
        params["img_emb"] = {
            "norm1": {"w": jnp.ones((1280,), dtype), "b": jnp.zeros((1280,), dtype)},
            "fc1": _linear_init(ks[9], 1280, 1280, dtype),
            "fc2": _linear_init(ks[10], 1280, d, dtype),
            "norm2": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        }
    if causal:
        # UniAnimate pose conditioning projection 5120 -> dim
        # (causal_model.py:493-503); identity when dim == 5120.
        if d != 5120:
            params["pose_proj"] = _linear_init(ks[11], 5120, d, dtype)
    return params


# =====================================================================
# pieces of the forward pass
# =====================================================================

def patchify(params: Params, cfg: WanConfig, x: jax.Array
             ) -> tuple[jax.Array, tuple[int, int, int]]:
    """[B, F, C, H, W] -> tokens [B, F*h*w, D]; conv == reshape+matmul.

    Token feature layout (C, ph, pw) matches the torch Conv3d kernel
    flattening so converted weights are bit-equivalent.
    """
    B, F, C, H, W = x.shape
    pf, ph, pw = cfg.patch_size
    assert pf == 1, "Wan uses temporal patch 1"
    h, w = H // ph, W // pw
    xt = x.reshape(B, F, C, h, ph, w, pw)
    xt = xt.transpose(0, 1, 3, 5, 2, 4, 6)      # B F h w C ph pw
    xt = xt.reshape(B, F * h * w, C * ph * pw)
    return linear(params["patch_embedding"], xt), (F, h, w)


def unpatchify(cfg: WanConfig, tokens: jax.Array,
               grid: tuple[int, int, int]) -> jax.Array:
    """tokens [B, L, pf*ph*pw*C] -> [B, F, C, H, W].

    Output vector layout (pf, ph, pw, C) matches reference unpatchify's
    einsum 'fhwpqrc->cfphqwr' (model.py:894-898).
    """
    F, h, w = grid
    pf, ph, pw = cfg.patch_size
    C = cfg.out_dim
    B = tokens.shape[0]
    u = tokens.reshape(B, F, h, w, pf, ph, pw, C)
    u = u.transpose(0, 1, 4, 7, 2, 5, 3, 6)      # B F pf C h ph w pw
    u = u.reshape(B, F * pf, C, h * ph, w * pw)
    return u


def time_embed(params: Params, cfg: WanConfig, t: jax.Array,
               dtype) -> tuple[jax.Array, jax.Array]:
    """t [B, F] -> (e [B, F, D], e0 [B, F, 6, D]).

    sinusoidal -> Linear/SiLU/Linear (model.py:589-592), then
    time_projection = SiLU/Linear to 6D chunks (model.py:591-592).
    """
    B, F = t.shape
    emb = sinusoidal_embedding_1d(cfg.freq_dim, t.reshape(-1)).astype(dtype)
    e = linear(params["time_embedding"]["fc2"],
               jax.nn.silu(linear(params["time_embedding"]["fc1"], emb)))
    e0 = linear(params["time_projection"]["fc"], jax.nn.silu(e))
    return e.reshape(B, F, cfg.dim), e0.reshape(B, F, 6, cfg.dim)


def embed_text(params: Params, cfg: WanConfig, context: jax.Array) -> jax.Array:
    """Text embedding MLP over padded [B, text_len, text_dim] context
    (model.py:585-587, zero-padded to text_len as in model.py:703-708)."""
    B, L, _ = context.shape
    if L < cfg.text_len:
        context = jnp.pad(context, ((0, 0), (0, cfg.text_len - L), (0, 0)))
    h = gelu_tanh(linear(params["text_embedding"]["fc1"], context))
    return linear(params["text_embedding"]["fc2"], h)


def embed_image(params: Params, clip_fea: jax.Array) -> jax.Array:
    """MLPProj of 257 CLIP tokens for i2v (model.py:469-481)."""
    p = params["img_emb"]
    x = layer_norm(clip_fea, 1e-5, p["norm1"]["w"], p["norm1"]["b"])
    x = linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], x), approximate=False))
    return layer_norm(x, 1e-5, p["norm2"]["w"], p["norm2"]["b"])


def _heads(cfg: WanConfig, x: jax.Array) -> jax.Array:
    B, L, _ = x.shape
    return x.reshape(B, L, cfg.num_heads, cfg.head_dim)


def _qkv(p: Params, cfg: WanConfig, x: jax.Array,
         q_gain: float | None = None):
    q, k, v = _qkv_project(p, x)
    if cfg.qk_norm:
        wq = p["norm_q"]["w"]
        if q_gain is not None:
            wq = wq * jnp.asarray(q_gain, wq.dtype)
        q = _qk_rms_norm(q, wq, cfg)
        k = _qk_rms_norm(k, p["norm_k"]["w"], cfg)
    elif q_gain is not None:
        q = q * jnp.asarray(q_gain, q.dtype)
    return _heads(cfg, q), _heads(cfg, k), _heads(cfg, v)


def _fold_heads(cfg: WanConfig, t: jax.Array) -> jax.Array:
    """[B, L, N*D] -> the attention kernels' folded [B*N, L, D] layout."""
    B, L, _ = t.shape
    return t.reshape(B, L, cfg.num_heads, cfg.head_dim).transpose(
        0, 2, 1, 3).reshape(B * cfg.num_heads, L, cfg.head_dim)


def _unfold_heads(cfg: WanConfig, t: jax.Array) -> jax.Array:
    """Folded [B*N, L, D] back to [B, L, N*D] (o-projection input)."""
    BN, L, D = t.shape
    B = BN // cfg.num_heads
    return t.reshape(B, cfg.num_heads, L, D).transpose(
        0, 2, 1, 3).reshape(B, L, cfg.num_heads * D)


def _rope_half_folded(x: jax.Array, cos: jax.Array,
                      sin: jax.Array) -> jax.Array:
    """_rope_half on the folded [B*N, L, D] layout; cos/sin [L, D/2].

    Applying the rotation after the head fold keeps every f32
    intermediate in the kernels' operand layout — the [B, L, N, D]
    staging costs ~8 ms/forward in XLA f32 layout copies at 1.3B.
    The barrier pins the bf16 fold: without it XLA hoists the f32
    upcast above the fold transpose and pays double-width copies."""
    half = x.shape[-1] // 2
    x = jax.lax.optimization_barrier(x)
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    c = cos[None, :, :]
    s = sin[None, :, :]
    y1 = x1 * c - x2 * s
    y2 = x2 * c + x1 * s
    return jnp.concatenate([y1, y2], axis=-1).astype(x.dtype)


def _bounded_active() -> bool:
    """The bounded-offset softmax only exists in the Pallas kernels; on the
    XLA dispatch path (CPU tests, set_attention_backend('xla')) the bound
    reductions and the kmax cache tracking would be dead weight — gate on
    the same seam the kernels dispatch through."""
    from self_forcing_tpu.ops.attention import _use_pallas
    return _use_pallas()


def _max_row_norm(t: jax.Array, heads_packed: Optional[int]) -> jax.Array:
    """Max 2-norm over per-head token rows.  t: [B, L, N*D] column-packed
    (``heads_packed=N``) or already-folded [BN, L, D].  Feeds the bounded-
    softmax score bound (Cauchy-Schwarz): one cheap fused reduce."""
    tf = t.astype(jnp.float32)
    if heads_packed is not None:
        B, L, ND = t.shape
        tf = tf.reshape(B, L, heads_packed, ND // heads_packed)
    return jnp.sqrt(jnp.max(jnp.sum(tf * tf, axis=-1)))


def _packed_ok(cfg: WanConfig) -> bool:
    """Column-packed kernel operands need a head to fill whole 128-lane
    blocks (Mosaic block granularity); production Wan head_dim is 128."""
    return cfg.head_dim % 128 == 0


def _qkv_project(p: Params, x: jax.Array):
    """Self-attention input projections: three separate linears, or the
    fused [in, 3*out] ``qkv`` matmul when the params were prepared with
    ops/quant.quantize_dit_params(fuse_qkv=True) — one MXU dispatch +
    one dequant-epilogue pass instead of three (exact same math; the
    split below is a free lane slice)."""
    if "qkv" in p:
        qkv = linear(p["qkv"], x)
        n = qkv.shape[-1] // 3
        return qkv[..., :n], qkv[..., n:2 * n], qkv[..., 2 * n:]
    return linear(p["q"], x), linear(p["k"], x), linear(p["v"], x)


def _qkv_rope_packed(p: Params, cfg: WanConfig, x: jax.Array,
                     cos: jax.Array, sin: jax.Array,
                     q_gain: float | None = None):
    """q/k/v in the natural [B, L, N*D] layout with RoPE applied through a
    bitcast head view — zero transposes (pairs with the attention
    kernels' ``heads_packed`` column slicing; the [BN, L, D] fold costs
    two f32 layout copies per tensor at 1.3B geometry).

    ``q_gain``: static scalar folded into q (via the qk-norm gain — a
    free [dim]-vector multiply) for the offset-free softmax kernel,
    which wants ``head_dim**-0.5 * log2(e)`` pre-applied (RoPE is a
    per-pair rotation, so the fold commutes with it exactly)."""
    q, k, v = _qkv_project(p, x)
    if cfg.qk_norm:
        wq = p["norm_q"]["w"]
        if q_gain is not None:
            wq = wq * jnp.asarray(q_gain, wq.dtype)
        q = _qk_rms_norm(q, wq, cfg)
        k = _qk_rms_norm(k, p["norm_k"]["w"], cfg)
    elif q_gain is not None:
        q = q * jnp.asarray(q_gain, q.dtype)
    B, L, _ = q.shape
    N, D = cfg.num_heads, cfg.head_dim

    def rope(t):
        t4 = t.reshape(B, L, N, D)
        return _rope_half(t4, cos, sin).reshape(B, L, N * D)

    return rope(q), rope(k), v


def _qkv_rope_folded(p: Params, cfg: WanConfig, x: jax.Array,
                     cos: jax.Array, sin: jax.Array,
                     q_gain: float | None = None):
    """q/k/v in the folded [B*N, L, D] layout with RoPE applied (q, k).

    Same math as _qkv + _rope_half (causal_model.py:111-117,195-200);
    the fold happens on the bf16 norm output and all rotation arithmetic
    stays in the kernel layout.  ``q_gain``: see _qkv_rope_packed."""
    q, k, v = _qkv_project(p, x)
    if cfg.qk_norm:
        wq = p["norm_q"]["w"]
        if q_gain is not None:
            wq = wq * jnp.asarray(q_gain, wq.dtype)
        q = _qk_rms_norm(q, wq, cfg)
        k = _qk_rms_norm(k, p["norm_k"]["w"], cfg)
    elif q_gain is not None:
        q = q * jnp.asarray(q_gain, q.dtype)
    qf = _rope_half_folded(_fold_heads(cfg, q), cos, sin)
    kf = _rope_half_folded(_fold_heads(cfg, k), cos, sin)
    return qf, kf, _fold_heads(cfg, v)


def precompute_context(params: Params, cfg: WanConfig, context: jax.Array,
                       clip_fea: jax.Array | None = None) -> dict:
    """Per-prompt preprocessing shared by every DiT forward.

    Returns cross-attention K/V per layer, stacked [L_layers, B, Lc, N, Dh].
    Replaces the reference's crossattn_cache (causal_inference.py:300-312).
    For i2v, image K/V come from the separate k_img/v_img projections
    (model.py:240-266) and are kept distinct.
    """
    ctx = embed_text(params, cfg, context)

    def per_block(bp):
        p = bp["cross_attn"]
        k = linear(p["k"], ctx)
        if cfg.qk_norm:
            k = _qk_rms_norm(k, p["norm_k"]["w"], cfg)
        v = linear(p["v"], ctx)
        return _heads(cfg, k), _heads(cfg, v)

    k_txt, v_txt = jax.vmap(per_block)(params["blocks"])
    out = {"k_txt": k_txt, "v_txt": v_txt}

    if clip_fea is not None and cfg.model_type == "i2v":
        img_ctx = embed_image(params, clip_fea)

        def per_block_img(bp):
            p = bp["cross_attn"]
            k = linear(p["k_img"], img_ctx)
            if cfg.qk_norm:
                k = _qk_rms_norm(k, p["norm_k_img"]["w"], cfg)
            v = linear(p["v_img"], img_ctx)
            return _heads(cfg, k), _heads(cfg, v)

        k_img, v_img = jax.vmap(per_block_img)(params["blocks"])
        out["k_img"] = k_img
        out["v_img"] = v_img
    return out


def _cross_attention(bp: Params, cfg: WanConfig, x: jax.Array,
                     ctx_kv_layer: dict) -> jax.Array:
    """T2V/I2V cross attention with precomputed K/V (model.py:159-266).

    q and the attention output stay in the natural [B, Lq, N*D] layout
    (heads_packed): the kernel column-slices heads, so no transpose (and
    no f32 fold copy) appears around the call."""
    p = bp["cross_attn"]
    q = linear(p["q"], x)
    if cfg.qk_norm:
        q = _qk_rms_norm(q, p["norm_q"]["w"], cfg)
    from self_forcing_tpu.ops.attention import cross_attention
    if _packed_ok(cfg):
        out = cross_attention(q, ctx_kv_layer["k_txt"],
                              ctx_kv_layer["v_txt"],
                              heads_packed=cfg.num_heads)
        if "k_img" in ctx_kv_layer:
            out = out + cross_attention(q, ctx_kv_layer["k_img"],
                                        ctx_kv_layer["v_img"],
                                        heads_packed=cfg.num_heads)
        return _out_linear(p["o"], out, cfg)
    q4 = _heads(cfg, q)
    out = cross_attention(q4, ctx_kv_layer["k_txt"], ctx_kv_layer["v_txt"])
    if "k_img" in ctx_kv_layer:
        out = out + cross_attention(q4, ctx_kv_layer["k_img"],
                                    ctx_kv_layer["v_img"])
    B, Lq = out.shape[:2]
    return _out_linear(p["o"],
                       out.reshape(B, Lq, cfg.num_heads * cfg.head_dim), cfg)


def _modulate(x: jax.Array, shift: jax.Array, scale_: jax.Array,
              frame_seqlen: int) -> jax.Array:
    """Per-frame AdaLN: x [B, F*fs, D] * (1 + scale[B,F,1,D]) + shift."""
    B, L, D = x.shape
    F = shift.shape[1]
    xf = x.reshape(B, F, frame_seqlen, D)
    out = xf * (1.0 + scale_) + shift
    return out.reshape(B, L, D)


def _gate(x: jax.Array, g: jax.Array, frame_seqlen: int) -> jax.Array:
    B, L, D = x.shape
    F = g.shape[1]
    return (x.reshape(B, F, frame_seqlen, D) * g).reshape(B, L, D)


def head_forward(params: Params, cfg: WanConfig, x: jax.Array,
                 e: jax.Array, frame_seqlen: int) -> jax.Array:
    """Final AdaLN head (causal_model.py:339-367): e is [B, F, D]."""
    hp = params["head"]
    mod = hp["modulation"].astype(jnp.float32)     # [1, 2, D]
    ef = e.astype(jnp.float32)[:, :, None, :]      # [B, F, 1, D]
    em = mod[:, None] + ef                          # [B, F, 2, D] broadcast
    shift = em[:, :, 0:1].astype(x.dtype)
    scale_ = em[:, :, 1:2].astype(x.dtype)
    xn = layer_norm(x, cfg.eps)
    return linear(hp["head"], _modulate(xn, shift, scale_, frame_seqlen))


# =====================================================================
# KV cache
# =====================================================================

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """Static-shape per-layer KV cache (causal_inference.py:278-298).

    k/v: [L, B*N, S, Dh] — stored PRE-FOLDED in the Pallas decode kernels'
    native (batch*heads, tokens, head_dim) layout so the per-layer hot
    path does zero transposes/pads (a [B, S, N, Dh] layout costs ~2.5
    ms/layer/forward in XLA relayout fusions at 1.3B geometry).  In the
    global-window case S is rounded up to the kernel tile (2048) so the
    runtime pad is a no-op; the pad region is never visible (attention is
    masked to [lo, hi), hi <= logical S).  ``global_end`` is the absolute
    token index of the newest cached token; ``local_end`` its position
    inside the (possibly rolled) cache — identical bookkeeping to
    causal_model.py:202-236 but as traced scalars shared by all layers.
    """

    k: jax.Array
    v: jax.Array
    global_end: jax.Array  # i32 scalar
    local_end: jax.Array   # i32 scalar
    # per-layer max 2-norm over cached K rows ([L] f32): the bounded-
    # softmax decode kernel needs an upper bound on attention scores
    # (Cauchy-Schwarz: s <= scale * |q_row| * max|k_row|); tracked
    # incrementally at cache-write time so no pass over the cache is ever
    # needed.  Zero when the cache is empty (scores over an empty window
    # are masked anyway).
    kmax: jax.Array

    def tree_flatten(self):
        return ((self.k, self.v, self.global_end, self.local_end,
                 self.kmax), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def init_kv_cache(cfg: WanConfig, batch_size: int, frame_seqlen: int,
                  num_frames: int, dtype=jnp.bfloat16) -> KVCache:
    """Zeroed cache sized local_attn_size frames if windowed, else
    num_frames (causal_inference.py:283-288)."""
    if cfg.local_attn_size != -1:
        # Buffer >= window (cfg.buffer_frames).  With buffer == window
        # (the default) eviction keeps content <= S == max_attention and
        # the window spans the whole live cache — the reference's sizing.
        # With a slack buffer (windowed_buffer_frames > local_attn_size)
        # blocks APPEND without eviction and the attention window is the
        # two-interval [0, sinks) + [recent) view; one contiguous-copy
        # compaction runs only when the buffer fills (evict_for).  The
        # kernel exact-fits its cache tile to S either way.
        S = cfg.buffer_frames * frame_seqlen
    else:
        S = num_frames * frame_seqlen
        if S > 2048:   # align to the decode kernel tile: runtime pad no-op
            S = -(-S // 2048) * 2048
    shape = (cfg.num_layers, batch_size * cfg.num_heads, S, cfg.head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
        global_end=jnp.zeros((), jnp.int32),
        local_end=jnp.zeros((), jnp.int32),
        kmax=jnp.zeros((cfg.num_layers,), jnp.float32))


def _windowed_compact(cfg: WanConfig, cache: KVCache, new_tokens: int,
                      frame_seqlen: int,
                      gate: jax.Array | bool = True) -> KVCache:
    """Contiguous-copy compaction of the windowed KV buffer before an
    ADVANCING write of ``new_tokens`` (static), when the write would
    overflow the physical buffer.

    Replaces the reference's per-block rolling eviction
    (causal_model.py:203-229): the surviving content — sink frames plus
    the most recent ``max_attention - sinks - new_tokens`` tokens (the
    exact set the next block may attend) — moves to the buffer front as
    ONE static-size dynamic-slice copy instead of a full-cache gather.
    With buffer == window this runs every steady-state block and is
    content-identical to the reference roll; with a slack buffer
    (cfg.windowed_buffer_frames) it runs only every
    ``(buffer - window + new) / new`` blocks.  local_end shrinks by the
    dropped count; global_end is untouched."""
    S = cache.k.shape[2]
    sink_tokens = cfg.sink_size * frame_seqlen
    keep_recent = max(0, cfg.max_attention_size(frame_seqlen)
                      - sink_tokens - new_tokens)
    need = jnp.asarray(gate) & (new_tokens + cache.local_end > S)
    post = sink_tokens + keep_recent  # local_end after compaction (static)

    def compact(kv):
        k, v = kv
        src = cache.local_end - keep_recent  # >= sink_tokens when `need`
        if keep_recent == 0:
            return k, v
        kr = jax.lax.dynamic_slice_in_dim(k, src, keep_recent, axis=2)
        vr = jax.lax.dynamic_slice_in_dim(v, src, keep_recent, axis=2)
        return (jax.lax.dynamic_update_slice_in_dim(k, kr, sink_tokens,
                                                    axis=2),
                jax.lax.dynamic_update_slice_in_dim(v, vr, sink_tokens,
                                                    axis=2))

    k, v = jax.lax.cond(need, compact, lambda kv: kv, (cache.k, cache.v))
    local_end = jnp.where(need, jnp.int32(post), cache.local_end)
    return dataclasses.replace(cache, k=k, v=v, local_end=local_end)


def evict_for(cfg: WanConfig, cache: KVCache, new_tokens: int) -> KVCache:
    """Pre-run the windowed buffer compaction for an ADVANCING write of
    ``new_tokens`` (windowed mode only; no-op on the global cache).

    Traced-cond convenience for callers that don't track the buffer fill
    themselves; the streaming pipeline instead host-schedules the
    cond-free :func:`compact_cache` (the cond's untaken branch allocates
    a full-buffer HLO temp inside donated programs)."""
    if cfg.local_attn_size == -1:
        return cache
    frame_seqlen = cache.k.shape[2] // cfg.buffer_frames
    return _windowed_compact(cfg, cache, new_tokens, frame_seqlen)


@functools.partial(jax.jit, static_argnames=("cfg", "new_tokens"),
                   donate_argnums=(1,))
def compact_cache(cfg: WanConfig, cache: KVCache,
                  new_tokens: int) -> KVCache:
    """UNCONDITIONAL windowed-buffer compaction as its own donated
    program, for host-scheduled eviction.

    The streaming block schedule is static, so the pipeline tracks the
    buffer fill in python and calls this exactly when the next block
    would overflow — the hot per-block jits then carry no compaction
    lax.cond at all (a cond roll inside the donated denoise program
    costs a full-buffer HLO temp for the untaken branch: +6.4 GB at a
    24-frame 1.3B buffer — OOM; measured r4).  With donation the copy
    here is in-place up to the moved region (~1/3 of the buffer).

    Content/semantics identical to _windowed_compact with need=True:
    keep sinks + the most recent (window - sinks - new_tokens) tokens.
    """
    frame_seqlen = cache.k.shape[2] // cfg.buffer_frames
    sink_tokens = cfg.sink_size * frame_seqlen
    keep = max(0, cfg.max_attention_size(frame_seqlen)
               - sink_tokens - new_tokens)
    k, v = cache.k, cache.v
    if keep:
        src = cache.local_end - keep
        kr = jax.lax.dynamic_slice_in_dim(k, src, keep, axis=2)
        vr = jax.lax.dynamic_slice_in_dim(v, src, keep, axis=2)
        k = jax.lax.dynamic_update_slice_in_dim(k, kr, sink_tokens, axis=2)
        v = jax.lax.dynamic_update_slice_in_dim(v, vr, sink_tokens, axis=2)
    return dataclasses.replace(cache, k=k, v=v,
                               local_end=jnp.int32(sink_tokens + keep))


def windowed_compaction_schedule(cfg: WanConfig, frame_seqlen: int,
                                 new_tokens: int):
    """(buffer_tokens, post_compact_tokens) for the host-side fill
    tracker: compact when ``content + new_tokens > buffer_tokens``; after
    compaction the content is ``post_compact_tokens``."""
    S = cfg.buffer_frames * frame_seqlen
    sink_tokens = cfg.sink_size * frame_seqlen
    keep = max(0, cfg.max_attention_size(frame_seqlen)
               - sink_tokens - new_tokens)
    return S, sink_tokens + keep


def reset_kv_cache(cache: KVCache) -> KVCache:
    return dataclasses.replace(
        cache,
        global_end=jnp.zeros((), jnp.int32),
        local_end=jnp.zeros((), jnp.int32),
        kmax=jnp.zeros_like(cache.kmax))


# =====================================================================
# transformer block (shared by all paths)
# =====================================================================

def _ffn(bp: Params, cfg: WanConfig, xn: jax.Array) -> jax.Array:
    """FFN fc2(gelu(fc1(x))); fused W8A8 path when both linears are
    quantized (ops/quant.quantized_ffn — keeps the gelu/quant chain in
    VMEM instead of three XLA passes over the [L, ffn] hidden)."""
    fc1, fc2 = bp["ffn"]["fc1"], bp["ffn"]["fc2"]
    if "w_qa" in fc1 and "w_qa" in fc2:
        # quantized path has no TP psum (parallel/tensor.py rejects
        # quantized params before it gets here)
        assert cfg.tp_axis is None, "W8A8 FFN is single-chip only"
        from self_forcing_tpu.ops.quant import quantized_ffn
        return quantized_ffn(fc1, fc2, xn)
    return _out_linear(fc2, gelu_tanh(linear(fc1, xn)), cfg)


def _block_train(bp: Params, cfg: WanConfig, x: jax.Array, e0: jax.Array,
                 rope_cos: jax.Array, rope_sin: jax.Array,
                 mask: IntervalMask, ctx_kv_layer: dict,
                 frame_seqlen: int, attn_fn=None) -> jax.Array:
    """One WanAttentionBlock, full-sequence (train) self-attention
    (causal_model.py:284-336).

    ``attn_fn(q, k, v) -> [B, L, N, D]`` replaces the flash-attention call
    when given (the sequence-parallel ring attention plugs in here so the
    surrounding block math is never forked)."""
    mod = bp["modulation"].astype(jnp.float32)[:, None]          # [1,1,6,D]
    e = (mod + e0.astype(jnp.float32)).astype(x.dtype)           # [B,F,6,D]
    e_shift, e_scale, e_gate = e[:, :, 0:1], e[:, :, 1:2], e[:, :, 2:3]
    f_shift, f_scale, f_gate = e[:, :, 3:4], e[:, :, 4:5], e[:, :, 5:6]

    # self attention
    xn = _modulate(layer_norm(x, cfg.eps), e_shift, e_scale, frame_seqlen)
    free = (attn_fn is None and cfg.attn_softmax == "free"
            and _bounded_active())
    q_gain = (cfg.head_dim ** -0.5) * LOG2E if free else None
    q, k, v = _qkv(bp["self_attn"], cfg, xn, q_gain=q_gain)
    q = _rope_half(q, rope_cos, rope_sin)
    k = _rope_half(k, rope_cos, rope_sin)
    if attn_fn is not None:
        attn = attn_fn(q, k, v)
    elif free:
        # offset-free base-2 softmax (scale*log2e folded into q above);
        # the kernel's backward recomputes p from the base-e lse at
        # scale=ln(2) — exact (ops/pallas_attention.py)
        attn = flash_attention(q, k, v, mask, softmax="free")
    else:
        m0 = None
        if cfg.attn_softmax == "bounded" and _bounded_active():
            # Cauchy-Schwarz score bound for the bounded-offset softmax
            # (same trick as the decode path — ops/pallas_attention.py)
            m0 = (cfg.head_dim ** -0.5) * _max_row_norm(q, None) \
                * _max_row_norm(k, None)
        attn = flash_attention(q, k, v, mask, fixed_m0=m0)
    B, L = attn.shape[:2]
    # num_heads*head_dim, not cfg.dim: under TP only the local heads live here
    y = _out_linear(bp["self_attn"]["o"],
                    attn.reshape(B, L, cfg.num_heads * cfg.head_dim), cfg)
    x = x + _gate(y, e_gate, frame_seqlen)

    # cross attention
    if "norm3" in bp:
        xc = layer_norm(x, cfg.eps, bp["norm3"]["w"], bp["norm3"]["b"])
    else:
        xc = x
    x = x + _cross_attention(bp, cfg, xc, ctx_kv_layer)

    # ffn
    xn = _modulate(layer_norm(x, cfg.eps), f_shift, f_scale, frame_seqlen)
    y = _ffn(bp, cfg, xn)
    return x + _gate(y, f_gate, frame_seqlen)


def _block_decode_fresh(bp: Params, cfg: WanConfig, x: jax.Array,
                        e0: jax.Array, rope_cos: jax.Array,
                        rope_sin: jax.Array, k_layer: jax.Array,
                        v_layer: jax.Array, attn_lo: jax.Array,
                        cache_hi: jax.Array, ctx_kv_layer: dict,
                        frame_seqlen: int,
                        static_kv_hi: int | None = None,
                        layer_idx: jax.Array | None = None,
                        emit_kv: bool = True,
                        kmax_layer: jax.Array | None = None,
                        sink_hi: jax.Array | None = None,
                        tk_align: int | None = None,
                        window_static: tuple | None = None):
    """One block with READ-ONLY cache attention: the current chunk's K/V
    are returned for a single out-of-scan cache write instead of being
    written per-layer (the cache-bandwidth fast path; semantics identical
    to causal_model.py:194-241).  ``emit_kv=False`` (denoise steps, where
    the refresh pass rewrites the block's slots anyway) skips the folded
    K/V outputs entirely — XLA does not reliably DCE the fold transposes
    through scan ys.

    ``k_layer``/``v_layer`` are either this layer's [BN, S, D] slices, or
    the FULL stacked [L, BN, S, D] cache with ``layer_idx`` set — the
    Pallas kernel then picks the layer itself, avoiding the per-layer
    slice materialization (PERF.md).

    ``kmax_layer``: this layer's cached-K row-norm bound (KVCache.kmax)
    — enables the bounded-softmax kernel (cfg.attn_softmax='bounded').

    Returns (x, k_new, v_new, kn_norm) — kn_norm is the fresh K's max row
    norm (f32 scalar) for the caller's incremental kmax update, or None.
    """
    from self_forcing_tpu.ops.attention import decode_attention_fresh

    mod = bp["modulation"].astype(jnp.float32)[:, None]
    e = (mod + e0.astype(jnp.float32)).astype(x.dtype)
    e_shift, e_scale, e_gate = e[:, :, 0:1], e[:, :, 1:2], e[:, :, 2:3]
    f_shift, f_scale, f_gate = e[:, :, 3:4], e[:, :, 4:5], e[:, :, 5:6]

    # attn_quant='int8' + the bound routes to the SAFE tile-bounded int8
    # kernel (per-row within-tile max; no global-m0 truncation cliff) —
    # the fastest shippable int8 variant (ops/pallas_attention.py)
    mode = cfg.attn_softmax
    if mode == "free" and cfg.attn_quant not in (None, "int8qk"):
        mode = "bounded"  # the full-int8 kernels need the m0 bound
    bounded = (mode == "bounded"
               and kmax_layer is not None and _bounded_active())
    # offset-free base-2 softmax (the bf16 default): scale*log2(e) is
    # pre-folded into q's norm gain and the kernel computes p = 2^s with
    # NO stability offset and a one-op overflow clamp — exact softmax for
    # any scores < 80 log2-units (ops/pallas_attention.py).
    free = mode == "free" and _bounded_active()
    q_gain = (cfg.head_dim ** -0.5) * LOG2E if free else None
    sm = "free" if free else None
    sc = 1.0 if free else None
    quant = cfg.attn_quant
    if quant == "int8qk" and not free:
        quant = None  # int8qk exists only on the free path
    kn_norm = None
    xn = _modulate(layer_norm(x, cfg.eps), e_shift, e_scale, frame_seqlen)
    if _packed_ok(cfg):
        # q/k/v stay in the natural [B, L, N*D] layout end to end: the
        # kernel slices head blocks out of the lane dimension
        # (heads_packed), so no transpose exists on the denoise hot path
        qp, kp, vp = _qkv_rope_packed(bp["self_attn"], cfg, xn,
                                      rope_cos, rope_sin, q_gain=q_gain)
        m0 = None
        if bounded:
            # score bound s <= scale * max|q_row| * max|k_row| over the
            # window = cached bound + this block's fresh K
            kn_norm = _max_row_norm(kp, cfg.num_heads)
            m0 = (cfg.head_dim ** -0.5) * _max_row_norm(qp, cfg.num_heads) \
                * jnp.maximum(kmax_layer, kn_norm)
        attn = decode_attention_fresh(qp, k_layer, v_layer, kp, vp,
                                      attn_lo, cache_hi,
                                      scale=sc,
                                      static_hi=static_kv_hi,
                                      quant=quant,
                                      layer_idx=layer_idx,
                                      heads_packed=cfg.num_heads,
                                      fixed_m0=m0, softmax=sm,
                                      sink_end=sink_hi,
                                      tk_align=tk_align,
                                      window_static=window_static)
        y = _out_linear(bp["self_attn"]["o"], attn, cfg)
        kf = vf = None  # folded on demand below
    else:
        # head_dim < 128 (tiny test geometries): lane blocks can't cover
        # a head, use the folded layout
        qp, kp, vp = None, None, None
        qf, kf, vf = _qkv_rope_folded(bp["self_attn"], cfg, xn,
                                      rope_cos, rope_sin, q_gain=q_gain)
        m0 = None
        if bounded:
            kn_norm = _max_row_norm(kf, None)
            m0 = (cfg.head_dim ** -0.5) * _max_row_norm(qf, None) \
                * jnp.maximum(kmax_layer, kn_norm)
        attn = decode_attention_fresh(qf, k_layer, v_layer, kf, vf,
                                      attn_lo, cache_hi,
                                      scale=sc,
                                      static_hi=static_kv_hi,
                                      quant=quant,
                                      layer_idx=layer_idx,
                                      fixed_m0=m0, softmax=sm,
                                      sink_end=sink_hi,
                                      tk_align=tk_align,
                                      window_static=window_static)
        y = _out_linear(bp["self_attn"]["o"], _unfold_heads(cfg, attn),
                        cfg)
    x = x + _gate(y, e_gate, frame_seqlen)

    if "norm3" in bp:
        xc = layer_norm(x, cfg.eps, bp["norm3"]["w"], bp["norm3"]["b"])
    else:
        xc = x
    x = x + _cross_attention(bp, cfg, xc, ctx_kv_layer)

    xn = _modulate(layer_norm(x, cfg.eps), f_shift, f_scale, frame_seqlen)
    y = _ffn(bp, cfg, xn)
    x = x + _gate(y, f_gate, frame_seqlen)
    if not emit_kv:
        return x, None, None, kn_norm
    # the cache write wants the folded layout
    if kf is None:
        kf, vf = _fold_heads(cfg, kp), _fold_heads(cfg, vp)
    return x, kf, vf, kn_norm


def _rope_half(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half RoPE; cos/sin [L, Dh/2].

    Equivalent to the reference's adjacent-pair complex rotation
    (model.py:52-63) because q/k projection columns are stored permuted
    to the half layout (rope.qk_half_perm): pair element 0 lives at i,
    element 1 at i + Dh/2.  The permutation is shared by q and k, so
    QK^T — and therefore every model output — is unchanged, while the
    rotation compiles to lane-aligned FMAs instead of the minor-dim-2
    relayout chain the interleaved form costs (~15 ms/forward at 1.3B)."""
    half = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    y1 = x1 * c - x2 * s
    y2 = x2 * c + x1 * s
    return jnp.concatenate([y1, y2], axis=-1).astype(x.dtype)


# =====================================================================
# GAN discriminator extras (RegisterTokens / GanAttentionBlock /
# cls_pred_branch — model.py:357-494, utils/wan_wrapper.py:182-201)
# =====================================================================

GAN_FFN_DIM = 8192  # GanAttentionBlock default (model.py:360-362)


def default_gan_taps(num_layers: int) -> tuple[int, ...]:
    """Feature-tap layer indices: 13/21/29 for the 30-layer 1.3B
    (model.py:750), scaled proportionally for other depths."""
    return tuple(min(num_layers - 1, round(f * num_layers))
                 for f in (13 / 30, 21 / 30, 29 / 30))


def init_cls_branch_params(key: jax.Array, cfg: WanConfig, num_class: int = 1,
                           time_embed_dim: int = 0,
                           dtype=jnp.float32) -> Params:
    """adding_cls_branch (utils/wan_wrapper.py:182-201): 3 register tokens,
    3 GanAttentionBlocks, LayerNorm+MLP classifier over the concatenated
    taps (+ optional time embedding)."""
    d = cfg.dim
    ks = jax.random.split(key, 8)
    num_registers = 3

    def ca_block(k):
        kk = jax.random.split(k, 5)
        return {
            "norm3": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
            "cross_attn": {
                "q": _linear_init(kk[0], d, d, dtype),
                "k": _linear_init(kk[1], d, d, dtype),
                "v": _linear_init(kk[2], d, d, dtype),
                "o": _linear_init(kk[3], d, d, dtype),
                "norm_q": {"w": jnp.ones((d,), dtype)},
                "norm_k": {"w": jnp.ones((d,), dtype)},
            },
            "ffn": {"fc1": _linear_init(kk[4], d, GAN_FFN_DIM, dtype),
                    "fc2": _linear_init(jax.random.fold_in(kk[4], 1),
                                        GAN_FFN_DIM, d, dtype)},
        }

    in_dim = d * num_registers + time_embed_dim
    return {
        "registers": (jax.random.normal(ks[0], (num_registers, d)) * 0.02
                      ).astype(dtype),
        "register_norm": {"w": jnp.ones((d,), dtype)},
        "ca_blocks": [ca_block(ks[1 + i]) for i in range(num_registers)],
        "cls": {
            "ln": {"w": jnp.ones((in_dim,), dtype),
                   "b": jnp.zeros((in_dim,), dtype)},
            "fc1": _linear_init(ks[5], in_dim, d, dtype),
            "fc2": _linear_init(ks[6], d, num_class, dtype),
        },
    }


def _gan_ca_block(bp: Params, cfg: WanConfig, x: jax.Array,
                  token: jax.Array) -> jax.Array:
    """GanAttentionBlock (model.py:357-436): 1-query cross attention from
    the register token into the tapped features, then FFN residual."""
    B = x.shape[0]
    xn = layer_norm(x, cfg.eps, bp["norm3"]["w"], bp["norm3"]["b"])
    p = bp["cross_attn"]
    q = rms_norm(linear(p["q"], token), p["norm_q"]["w"], cfg.eps)
    k = rms_norm(linear(p["k"], xn), p["norm_k"]["w"], cfg.eps)
    v = linear(p["v"], xn)
    out = dense_attention(_heads(cfg, q), _heads(cfg, k), _heads(cfg, v))
    out = linear(p["o"], out.reshape(B, 1, cfg.dim))
    tok = token + out
    y = linear(bp["ffn"]["fc2"], gelu_tanh(linear(bp["ffn"]["fc1"],
                                                  layer_norm(tok, cfg.eps))))
    return y + tok


def _slice_blocks(blocks: Params, lo: int, hi: int) -> Params:
    return jax.tree.map(lambda a: a[lo:hi], blocks)


def forward_classify(params: Params, cls_params: Params, cfg: WanConfig,
                     x: jax.Array, t: jax.Array, context: jax.Array,
                     rope: RopeTables,
                     concat_time_embeddings: bool = False,
                     remat: bool = True) -> tuple[jax.Array, jax.Array]:
    """Bidirectional forward with GAN feature taps (classify_mode,
    model.py:730-770): returns (flow_pred, logits [B, num_class]).

    The 30-block scan is split into segments at the tap layers; each tap
    feeds a 1-token cross-attention block whose outputs concatenate into
    the classifier head."""
    B, F = x.shape[:2]
    tokens, grid = patchify(params, cfg, x)
    frame_seqlen = grid[1] * grid[2]
    e, e0 = time_embed(params, cfg, t, tokens.dtype)
    cos, sin = rope.angles_for_grid(*grid, 0)
    ctx_kv = precompute_context(params, cfg, context)

    block_fn = _block_train
    if remat:
        block_fn = jax.checkpoint(
            _block_train, static_argnums=(1, 8),
            policy=jax.checkpoint_policies.nothing_saveable)

    def scan_seg(tokens, lo, hi):
        if hi <= lo:
            return tokens

        def body(tok, xs):
            bp, kt, vt = xs
            tok = block_fn(bp, cfg, tok, e0, cos, sin, None,
                           {"k_txt": kt, "v_txt": vt}, frame_seqlen)
            return tok, None

        xs = (_slice_blocks(params["blocks"], lo, hi),
              ctx_kv["k_txt"][lo:hi], ctx_kv["v_txt"][lo:hi])
        tokens, _ = jax.lax.scan(body, tokens, xs)
        return tokens

    taps = default_gan_taps(cfg.num_layers)
    registers = rms_norm(cls_params["registers"],
                         cls_params["register_norm"]["w"]).astype(tokens.dtype)

    lo = 0
    tap_feats = []
    for i, tap in enumerate(taps):
        tokens = scan_seg(tokens, lo, tap + 1)
        lo = tap + 1
        token = jnp.broadcast_to(registers[i][None, None],
                                 (B, 1, cfg.dim))
        tap_feats.append(_gan_ca_block(cls_params["ca_blocks"][i], cfg,
                                       tokens, token))
    tokens = scan_seg(tokens, lo, cfg.num_layers)

    feats = jnp.concatenate(tap_feats, axis=1).reshape(B, -1)  # [B, 3D]
    if concat_time_embeddings:
        feats = jnp.concatenate([feats, 10.0 * e[:, 0]], axis=-1)
    c = cls_params["cls"]
    h = layer_norm(feats[:, None], 1e-5, c["ln"]["w"], c["ln"]["b"])[:, 0]
    logits = linear(c["fc2"], jax.nn.silu(linear(c["fc1"], h)))

    out_tokens = head_forward(params, cfg, tokens, e, frame_seqlen)
    return unpatchify(cfg, out_tokens, grid), logits


# =====================================================================
# top-level forwards
# =====================================================================

def _maybe_add_condition(params: Params, cfg: WanConfig, x: jax.Array,
                         add_condition: jax.Array | None) -> jax.Array:
    """Pose conditioning: project 5120 -> dim and add to tokens
    (causal_model.py:783-819)."""
    if add_condition is None:
        return x
    if "pose_proj" in params:
        cond = linear(params["pose_proj"], add_condition.astype(x.dtype))
    else:
        cond = add_condition.astype(x.dtype)
    return x + cond


def forward_train(params: Params, cfg: WanConfig, x: jax.Array,
                  t: jax.Array, context: jax.Array,
                  mask: IntervalMask | None,
                  rope: RopeTables,
                  clean_x: jax.Array | None = None,
                  aug_t: jax.Array | None = None,
                  y: jax.Array | None = None,
                  clip_fea: jax.Array | None = None,
                  add_condition: jax.Array | None = None,
                  remat: bool = True) -> jax.Array:
    """No-cache forward: bidirectional (mask=None ≍ WanModel._forward,
    model.py:637-771) or masked causal training
    (CausalWanModel._forward_train, causal_model.py:895-1069), including the
    teacher-forcing [clean | noisy] doubled sequence when ``clean_x`` is
    given.

    x: [B, F, C, H, W]; t: [B, F] (bidirectional callers broadcast a [B]
    timestep); context: [B, <=512, text_dim].  Returns flow prediction
    [B, F, C, H, W].
    """
    B, F = x.shape[:2]
    if y is not None:
        x = jnp.concatenate([x, y], axis=2)   # channel concat (model.py:679-680)

    tokens, grid = patchify(params, cfg, x)
    frame_seqlen = grid[1] * grid[2]
    tokens = _maybe_add_condition(params, cfg, tokens, add_condition)
    e, e0 = time_embed(params, cfg, t, tokens.dtype)

    cos, sin = rope.angles_for_grid(*grid, 0)

    if clean_x is not None:
        # teacher forcing: [clean | noisy] (causal_model.py:1017-1034)
        clean_tokens, _ = patchify(params, cfg, clean_x)
        tokens = jnp.concatenate([clean_tokens, tokens], axis=1)
        if aug_t is None:
            aug_t = jnp.zeros_like(t)
        _, e0_clean = time_embed(params, cfg, aug_t, tokens.dtype)
        e0 = jnp.concatenate([e0_clean, e0], axis=1)
        # same RoPE for both halves (causal_model.py:121-135)
        cos = jnp.concatenate([cos, cos], axis=0)
        sin = jnp.concatenate([sin, sin], axis=0)

    ctx_kv = precompute_context(params, cfg, context, clip_fea)

    block_fn = _block_train
    if remat:
        # args: (bp, cfg, tok, e0, cos, sin, mask, ctx, frame_seqlen);
        # cfg and frame_seqlen are static.
        block_fn = jax.checkpoint(
            _block_train, static_argnums=(1, 8),
            policy=jax.checkpoint_policies.nothing_saveable)

    def scan_body(tok, xs):
        bp, kt, vt = xs
        layer_ctx = {"k_txt": kt, "v_txt": vt}
        if "k_img" in ctx_kv:
            # i2v image K/V are also per-layer; handled in outer closure.
            pass
        tok = block_fn(bp, cfg, tok, e0, cos, sin, mask, layer_ctx,
                       frame_seqlen)
        return tok, None

    if "k_img" in ctx_kv:
        def scan_body(tok, xs):  # noqa: F811 — i2v variant
            bp, kt, vt, ki, vi = xs
            layer_ctx = {"k_txt": kt, "v_txt": vt, "k_img": ki, "v_img": vi}
            tok = block_fn(bp, cfg, tok, e0, cos, sin, mask, layer_ctx,
                           frame_seqlen)
            return tok, None
        xs = (params["blocks"], ctx_kv["k_txt"], ctx_kv["v_txt"],
              ctx_kv["k_img"], ctx_kv["v_img"])
    else:
        xs = (params["blocks"], ctx_kv["k_txt"], ctx_kv["v_txt"])

    tokens, _ = jax.lax.scan(scan_body, tokens, xs)

    if clean_x is not None:
        tokens = tokens[:, tokens.shape[1] // 2:]

    out_tokens = head_forward(params, cfg, tokens, e, frame_seqlen)
    return unpatchify(cfg, out_tokens, grid)


def forward_inference(params: Params, cfg: WanConfig, x: jax.Array,
                      t: jax.Array, ctx_kv: dict, cache: KVCache,
                      start_frame: jax.Array, rope: RopeTables,
                      y: jax.Array | None = None,
                      add_condition: jax.Array | None = None,
                      cache_start_frame: jax.Array | None = None,
                      static_kv_hi: int | None = None,
                      write_cache: bool = True,
                      assume_compacted: bool = False,
                      remat: bool = False
                      ) -> tuple[jax.Array, KVCache]:
    """KV-cached streaming forward (CausalWanModel._forward_inference,
    causal_model.py:725-893).

    ``remat=True``: per-layer gradient checkpointing (nothing_saveable)
    on the layer scan — REQUIRED for with-grad forwards at production
    geometry (the training rollout's exit step): without it the scan
    saves every layer's attention internals for backward (~5.4 GB fp32
    per 21-frame block at 1.3B — 37.7 GB across a 7-block rollout,
    measured by the 14B AOT compile, parallel/aot.py).  Inference-only
    callers keep the default (no recompute cost).

    x: [B, F_blk, C, H, W] — the current chunk; t: [B, F_blk];
    ``ctx_kv`` from :func:`precompute_context`; ``start_frame``: i32 scalar,
    absolute frame index of this chunk (RoPE position).  For long-video
    sliding windows ``cache_start_frame`` decouples the cache write position
    from the RoPE offset (reference current_start vs cache_start,
    causal_diffusion_inference.py:184,256); defaults to ``start_frame``.
    Returns (flow_pred, new_cache).
    """
    if y is not None:
        x = jnp.concatenate([x, y], axis=2)

    tokens, grid = patchify(params, cfg, x)
    Fb, h, w = grid
    frame_seqlen = h * w
    tokens = _maybe_add_condition(params, cfg, tokens, add_condition)
    e, e0 = time_embed(params, cfg, t, tokens.dtype)

    start_frame = jnp.asarray(start_frame, jnp.int32)
    cos, sin = rope.angles_for_grid(Fb, h, w, start_frame)

    if cache_start_frame is None:
        cache_start_frame = start_frame
    cache_start_frame = jnp.asarray(cache_start_frame, jnp.int32)

    # --- cache index bookkeeping (causal_model.py:202-229), shared by all
    # layers, computed once.
    Lq = Fb * frame_seqlen
    S = cache.k.shape[2]
    current_start = cache_start_frame * frame_seqlen
    current_end = current_start + Lq
    sink_tokens = cfg.sink_size * frame_seqlen
    max_attn = cfg.max_attention_size(frame_seqlen)

    if cfg.local_attn_size != -1:
        # windowed: compaction fallback for direct callers, then
        # append-only writes with the TWO-interval [sinks | recent]
        # attention window — no per-block roll.  Only ADVANCING writes
        # may compact (causal_model.py:203 `if current_end >
        # self.kv_cache_length`-style gating): a rewrite of an
        # already-cached block must leave the buffer as-is.
        # ``assume_compacted=True`` (the streaming hot path — the
        # pipeline host-schedules dit.compact_cache between blocks)
        # omits the cond entirely: its untaken branch would cost a
        # full-buffer HLO temp inside the donated per-block programs.
        if not assume_compacted:
            advancing = current_end > cache.global_end
            cache = _windowed_compact(cfg, cache, Lq, frame_seqlen,
                                      gate=advancing)
        keep_recent = max(0, max_attn - sink_tokens - Lq)
        local_end = cache.local_end + (current_end - cache.global_end)
        write_at = local_end - Lq
        sink_hi = jnp.minimum(sink_tokens, write_at)
        attn_lo = jnp.maximum(sink_hi, write_at - keep_recent)
    else:
        local_end = cache.local_end + (current_end - cache.global_end)
        write_at = local_end - Lq
        sink_hi = None
        attn_lo = jnp.maximum(0, local_end - max_attn)

    has_img = "k_img" in ctx_kv

    if cfg.local_attn_size == -1:
        # ---- fast path (global cache, no eviction): the cache is READ
        # ONLY inside the layer scan; each layer emits its fresh K/V
        # (Lq tokens) and ONE fused dynamic_update_slice outside the scan
        # writes all layers at once.  Avoids hauling the multi-GB cache
        # through scan carries/ys (~2x forward latency at 1.3B geometry).
        # the cache is NOT scanned over: the kernel indexes the layer via
        # a prefetched scalar, so the scan carries only a layer counter
        # (scanning cache.k/v as xs costs a 100 MB dynamic-slice
        # materialization per layer per forward — measured; PERF.md)
        num_layers = cache.k.shape[0]
        layer_ids = jnp.arange(num_layers, dtype=jnp.int32)

        def scan_body(tok, xs):
            if has_img:
                bp, li, kt, vt, ki, vi = xs
                layer_ctx = {"k_txt": kt, "v_txt": vt, "k_img": ki,
                             "v_img": vi}
            else:
                bp, li, kt, vt = xs
                layer_ctx = {"k_txt": kt, "v_txt": vt}
            tok, k_new, v_new, kn_norm = _block_decode_fresh(
                bp, cfg, tok, e0, cos, sin, cache.k, cache.v, attn_lo,
                write_at, layer_ctx, frame_seqlen, static_kv_hi,
                layer_idx=li, emit_kv=write_cache,
                kmax_layer=cache.kmax[li])
            if not write_cache:
                return tok, None
            return tok, ((k_new, v_new, kn_norm) if kn_norm is not None
                         else (k_new, v_new))

        if has_img:
            xs = (params["blocks"], layer_ids, ctx_kv["k_txt"],
                  ctx_kv["v_txt"], ctx_kv["k_img"], ctx_kv["v_img"])
        else:
            xs = (params["blocks"], layer_ids, ctx_kv["k_txt"],
                  ctx_kv["v_txt"])
        body = scan_body
        if remat:
            body = jax.checkpoint(
                scan_body, prevent_cse=False,
                policy=jax.checkpoint_policies.nothing_saveable)
        tokens, ys = jax.lax.scan(body, tokens, xs)
        new_kmax = cache.kmax
        if write_cache:
            if len(ys) == 3:
                ks_new, vs_new, kn_norms = ys
                # incremental per-layer cached-K row-norm bound for the
                # bounded-softmax kernel (kn_norms: [L] f32)
                new_kmax = jnp.maximum(cache.kmax, kn_norms)
            else:
                ks_new, vs_new = ys
            # ks_new/vs_new: [L, B*N, Lq, D] — already in the cache layout
            new_k = jax.lax.dynamic_update_slice(
                cache.k, ks_new.astype(cache.k.dtype), (0, 0, write_at, 0))
            new_v = jax.lax.dynamic_update_slice(
                cache.v, vs_new.astype(cache.v.dtype), (0, 0, write_at, 0))
        else:
            # DEAD-STORE elimination for the streaming sampler: within a
            # block's denoise steps the fresh K/V are consumed directly by
            # decode_attention_fresh ([0, write_at) window excludes the
            # own-block cache region), and the cache-refresh pass rewrites
            # these slots afterwards — so the intermediate writes (and the
            # index advance) can be skipped entirely (~7 ms x 35 forwards
            # per 81-frame video).
            new_k, new_v = cache.k, cache.v
    else:
        # ---- windowed path with attention sinks (causal_model.py:
        # 203-229 semantics).  Round 4 removed the per-block eviction
        # roll entirely: blocks APPEND into a slack buffer and the
        # decode kernel reads the live content as the two-interval
        # [0, sink_hi) + [attn_lo, write_at) window (any already-evicted
        # tokens still physically present are simply invisible); a
        # contiguous-copy compaction runs only when the buffer fills
        # (_windowed_compact — already applied above / via evict_for).
        # The cache is READ ONLY inside the layer scan and one fused
        # dynamic_update_slice writes every layer's new K/V.  The
        # offset-free softmax applies here too (it needs no kmax bound,
        # which eviction could never track); 'bounded' mode falls back
        # to the online kernel as before (kmax_layer=None).
        num_layers = cache.k.shape[0]
        layer_ids = jnp.arange(num_layers, dtype=jnp.int32)
        # frame-aligned cache tiles: interval bounds are whole frames,
        # so every live tile takes the kernel's mask-free path
        tkal = frame_seqlen if frame_seqlen % 8 == 0 else None

        def scan_body(tok, xs):
            if has_img:
                bp, li, kt, vt, ki, vi = xs
                layer_ctx = {"k_txt": kt, "v_txt": vt, "k_img": ki,
                             "v_img": vi}
            else:
                bp, li, kt, vt = xs
                layer_ctx = {"k_txt": kt, "v_txt": vt}
            tok, k_new, v_new, _ = _block_decode_fresh(
                bp, cfg, tok, e0, cos, sin, cache.k, cache.v, attn_lo,
                write_at, layer_ctx, frame_seqlen, None,
                layer_idx=li, emit_kv=write_cache, kmax_layer=None,
                sink_hi=sink_hi, tk_align=tkal,
                window_static=(sink_tokens, keep_recent))
            if not write_cache:
                return tok, None
            return tok, (k_new, v_new)

        if has_img:
            xs = (params["blocks"], layer_ids, ctx_kv["k_txt"],
                  ctx_kv["v_txt"], ctx_kv["k_img"], ctx_kv["v_img"])
        else:
            xs = (params["blocks"], layer_ids, ctx_kv["k_txt"],
                  ctx_kv["v_txt"])
        tokens, ys = jax.lax.scan(scan_body, tokens, xs)
        if write_cache:
            ks_new, vs_new = ys
            new_k = jax.lax.dynamic_update_slice(
                cache.k, ks_new.astype(cache.k.dtype), (0, 0, write_at, 0))
            new_v = jax.lax.dynamic_update_slice(
                cache.v, vs_new.astype(cache.v.dtype), (0, 0, write_at, 0))
        else:
            new_k, new_v = cache.k, cache.v
        new_kmax = cache.kmax

    if write_cache:
        new_cache = KVCache(k=new_k, v=new_v,
                            global_end=jnp.asarray(current_end, jnp.int32),
                            local_end=jnp.asarray(local_end, jnp.int32),
                            kmax=new_kmax)
    else:
        new_cache = cache

    out_tokens = head_forward(params, cfg, tokens, e, frame_seqlen)
    return unpatchify(cfg, out_tokens, grid), new_cache
