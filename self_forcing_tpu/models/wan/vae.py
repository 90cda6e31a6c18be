"""Wan2.1 3D causal VAE, TPU-native.

Functional re-design of the reference WanVAE_ (wan/modules/vae.py:483-609):
a causal 3D conv encoder/decoder with temporal stride 4 and spatial
stride 8 (z_dim 16, dim 96, dim_mult [1,2,4,4],
temperal_downsample [False, True, True] — wan/modules/vae.py:612-625).

Key re-design decisions:
- Channels-last [B, T, H, W, C] layout throughout (TPU conv layout).
- The reference threads a mutable ``feat_cache`` list through every
  CausalConv3d (vae.py:28-36, 545-569).  Here the cache is an explicit
  tuple pytree in conv-visit order, *carried functionally*: every call
  returns the new cache, so the per-frame decode loop is a ``lax.scan``.
- The "first chunk" special cases (encoder 1+4k chunking vae.py:517-543,
  decoder 'Rep' sentinel skipping the temporal upsample on frame 0,
  vae.py:104-137) become two compiled functions: ``*_first`` (no temporal
  resampling, zero cache) and ``*_step`` (steady state).  Zero-initialized
  caches are numerically identical to the reference's causal zero padding.
- Latent normalization constants match utils/wan_wrapper.py:61-70.

Geometry: 21 latent frames -> 1 + 20*4 = 81 pixel frames.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict
CACHE_T = 2

LATENT_MEAN = np.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
], np.float32)
LATENT_STD = np.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
], np.float32)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temperal_downsample: tuple[bool, ...] = (False, True, True)

    @property
    def temperal_upsample(self) -> tuple[bool, ...]:
        return tuple(reversed(self.temperal_downsample))


WAN_VAE = VAEConfig()
VAE_TINY = VAEConfig(dim=8, z_dim=4, dim_mult=(1, 2, 2, 2), num_res_blocks=1)


# ============================================================ primitives

def _conv3d(p: Params, x: jax.Array, stride=(1, 1, 1),
            spatial_pad=(0, 0)) -> jax.Array:
    """NDHWC conv; temporal padding is handled by the caller (causal)."""
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride,
        padding=((0, 0), spatial_pad, spatial_pad),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + p["b"]


# Conv backend switch (documented seam; replaces round-1/2's SF_TPU_*
# env flags).  None = XLA convs — the measured winner on v5e at every
# real VAE geometry (PERF.md: the Pallas strip-matmul conv reaches 93
# TF/s on isolated batches but loses end-to-end to XLA's fused conv
# pipeline; the fused norm+silu+conv residual kernel compiles minutes
# and runs 22 T/s).  Both kept as tested seams for chips where the
# tradeoff flips.
_CONV_BACKEND: str | None = None


def set_conv_backend(name: str | None) -> None:
    """Select the decoder conv implementation: None (XLA, default),
    'pallas' (strip-matmul conv kernel, ops/pallas_conv.py), or 'fused'
    (fused norm+silu+conv residual blocks)."""
    global _CONV_BACKEND
    assert name in (None, "pallas", "fused"), name
    _CONV_BACKEND = name


def _use_pallas_conv() -> bool:
    if _CONV_BACKEND != "pallas":
        return False
    from self_forcing_tpu.ops.attention import _use_pallas
    return _use_pallas()


def causal_conv3d(p: Params, x: jax.Array, cache: jax.Array | None,
                  stride=(1, 1, 1), kernel=(3, 3, 3)):
    """CausalConv3d (vae.py:17-36): temporal-causal via front context.

    x: [B, T, H, W, C]; ``cache``: [B, kt-1, H, W, C] of previous input
    frames (zeros == the reference's zero padding) or None for kt == 1.
    Returns (y, new_cache).

    On TPU the 3x3x3 stride-1 case (the decoder's hot op) runs through the
    Pallas strip-matmul kernel (ops/pallas_conv.py, ~10x XLA's conv floor
    at these geometries).
    """
    kt = kernel[0]
    sp = (kernel[1] // 2, kernel[2] // 2)
    if kt == 1:
        return _conv3d(p, x, stride, sp), cache
    if cache is None:
        cache = jnp.zeros(
            (x.shape[0], kt - 1, *x.shape[2:]), x.dtype)
    if (kernel == (3, 3, 3) and stride == (1, 1, 1)
            and _use_pallas_conv()):
        # only the FUSED single-call kernel wins in the streaming scan;
        # convs whose weights don't fit VMEM (384ch, small spatial) stay
        # on XLA (the 3-call temporal split loses to padding overhead)
        from self_forcing_tpu.ops.pallas_conv import _conv3d_fused
        y = _conv3d_fused(x, cache, p["w"], p["b"], False)
        if y is not None:
            new_cache = jnp.concatenate([cache.astype(x.dtype), x],
                                        axis=1)[:, -(kt - 1):]
            return y, new_cache
    xin = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    y = _conv3d(p, xin, stride, sp)
    # Build the new cache from x/cache directly, NOT by slicing ``xin``:
    # when the concat feeds both the conv and the carried cache, XLA must
    # materialize it in a canonical layout and pays a relayout copy on the
    # conv operand (~9 ms/conv at 480x832x96 — trace-measured; the copies
    # were ~18% of the whole VAE decode).  With the conv as sole consumer
    # the concat fuses into the conv's input pipeline.
    T = x.shape[1]
    if T >= kt - 1:
        new_cache = x[:, -(kt - 1):]
    else:  # T == 1, kt == 3: new cache is [cache[-1], x]
        new_cache = jnp.concatenate([cache[:, -(kt - 1 - T):].astype(x.dtype),
                                     x], axis=1)
    return y, new_cache


def rms_norm_channel(gamma: jax.Array, x: jax.Array) -> jax.Array:
    """RMS_norm (vae.py:39-54): F.normalize over channel * sqrt(C) * gamma.

    Keep this the naive form: XLA fuses the reduce + rescale with the
    neighbouring silu/conv into one pass.  An MXU-row-sum variant that is
    2.2x faster STANDALONE made the whole decoder 26% slower end-to-end
    by breaking those fusions (measured on v5e; see PERF.md)."""
    C = x.shape[-1]
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-24)
    out = xf * inv * math.sqrt(C) * gamma.astype(jnp.float32)
    return out.astype(x.dtype)


def _conv2d(p: Params, x: jax.Array, stride=(1, 1), padding="SAME") -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


# ============================================================ blocks

def _use_fused_resblock() -> bool:
    """set_conv_backend('fused'): route residual blocks through the
    fused norm+silu+conv Pallas kernel (ops/pallas_conv.py v3)."""
    if _CONV_BACKEND != "fused":
        return False
    from self_forcing_tpu.ops.attention import _use_pallas
    return _use_pallas()


def _residual_block_fused(p: Params, x: jax.Array, cache: list):
    """Whole ResidualBlock in two fused Pallas calls.

    NOTE cache semantics differ from the XLA path: the fused kernel
    normalizes+activates its DMA'd strips in the prologue, so the cache
    slots hold RAW conv inputs (x / conv1-output frames) instead of the
    activated values.  Exact same math — norm+silu are pointwise and
    frame-local, and silu(norm(0)) == 0 matches zero-init caches.  The
    path choice is static per block (shapes), so a decode session is
    internally consistent.  Returns None if the geometry doesn't fit.
    """
    from self_forcing_tpu.ops.pallas_conv import norm_silu_conv3d_pallas
    B = x.shape[0]
    if B != 1:
        return None
    xt = jnp.concatenate([cache[0].astype(x.dtype), x], axis=1)
    v = norm_silu_conv3d_pallas(xt[0], p["norm1"], p["conv1"]["w"],
                                p["conv1"]["b"])
    if v is None:
        return None
    h, _ = causal_conv3d(p["shortcut"], x, None, kernel=(1, 1, 1)) \
        if p.get("shortcut") else (x, None)
    vt = jnp.concatenate([cache[1].astype(v.dtype), v[None]], axis=1)
    y = norm_silu_conv3d_pallas(vt[0], p["norm2"], p["conv2"]["w"],
                                p["conv2"]["b"], residual=h[0])
    if y is None:
        return None
    return y[None], [xt[:, -CACHE_T:], vt[:, -CACHE_T:]]


def residual_block(p: Params, x: jax.Array, cache: list):
    """ResidualBlock (vae.py:186-220). Consumes 2 cache slots."""
    if _use_fused_resblock():
        out = _residual_block_fused(p, x, cache)
        if out is not None:
            return out
    h, _ = causal_conv3d(p["shortcut"], x, None, kernel=(1, 1, 1)) \
        if p.get("shortcut") else (x, None)
    y = rms_norm_channel(p["norm1"], x)
    y = jax.nn.silu(y)
    y, c0 = causal_conv3d(p["conv1"], y, cache[0])
    y = rms_norm_channel(p["norm2"], y)
    y = jax.nn.silu(y)
    y, c1 = causal_conv3d(p["conv2"], y, cache[1])
    return y + h, [c0, c1]


def attention_block(p: Params, x: jax.Array) -> jax.Array:
    """Single-head spatial self-attention per frame (vae.py:223-262)."""
    B, T, H, W, C = x.shape
    idn = x
    h = rms_norm_channel(p["norm"], x)
    h = h.reshape(B * T, H * W, C)
    qkv = h @ p["to_qkv"]["w"] + p["to_qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scores = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32) * (C ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v)
    o = o @ p["proj"]["w"] + p["proj"]["b"]
    return idn + o.reshape(B, T, H, W, C)


def _spatial_resample_up(p: Params, x: jax.Array) -> jax.Array:
    """nearest 2x upsample + 3x3 conv to C/2 (vae.py:76-83).

    NOTE a subpixel rewrite (fold the upsample into a 2x2 conv with 4
    output phases, 2.25x fewer FLOPs) was tried and measured 21% SLOWER
    end-to-end on v5e (6.2 vs 5.2 s for the 81-frame streaming decode):
    the phase-reassembly relayout on the full-res output costs more than
    the saved conv FLOPs.  Keep the straightforward form — XLA's native
    conv path wins here (see PERF.md).
    """
    B, T, H, W, C = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    x2 = x.reshape(B * T, 2 * H, 2 * W, C)
    y = _conv2d(p["conv"], x2)
    return y.reshape(B, T, 2 * H, 2 * W, -1)


def _spatial_resample_down(p: Params, x: jax.Array) -> jax.Array:
    """ZeroPad2d((0,1,0,1)) + 3x3 stride-2 conv (vae.py:87-90)."""
    B, T, H, W, C = x.shape
    x2 = x.reshape(B * T, H, W, C)
    x2 = jnp.pad(x2, ((0, 0), (1, 1), (1, 1), (0, 0)))[:, 1:, 1:]
    # torch Conv2d(k=3, stride=2, no pad) over input padded (left0,right1,top0,bottom1)
    y = jax.lax.conv_general_dilated(
        x2, p["conv"]["w"], window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["conv"]["b"]
    Ho, Wo = y.shape[1], y.shape[2]
    return y.reshape(B, T, Ho, Wo, -1)


def upsample3d(p: Params, x: jax.Array, cache_entry, first: bool):
    """Resample upsample3d (vae.py:103-141).

    On the first latent frame the temporal conv is skipped entirely and no
    time doubling happens ('Rep' sentinel path); afterwards time_conv(C->2C)
    + frame interleave doubles T.  cache_entry: [B, 2, H, W, C].
    """
    B, T, H, W, C = x.shape
    if first:
        # 'Rep' sentinel semantics (vae.py:106-108,120-127): frame 0 skips
        # the temporal conv entirely AND its input never enters the conv
        # history — the next frame convolves against zeros.
        new_cache = jnp.zeros((B, 2, H, W, C), x.dtype)
        return _spatial_resample_up(p, x), new_cache
    y, new_cache = causal_conv3d(p["time_conv"], x, cache_entry,
                                 kernel=(3, 1, 1))
    # y: [B, T, H, W, 2C] -> interleave the two C-groups along time
    y = y.reshape(B, T, H, W, 2, C)
    y = y.transpose(0, 1, 4, 2, 3, 5).reshape(B, 2 * T, H, W, C)
    return _spatial_resample_up(p, y), new_cache


def downsample3d(p: Params, x: jax.Array, cache_entry, first: bool):
    """Resample downsample3d (vae.py:143-159): spatial down first, then
    temporal stride-2 conv over [cache_frame | x]."""
    x = _spatial_resample_down(p, x)
    if first:
        # reference stores x and skips the temporal conv on chunk 0
        return x, x[:, -1:]
    xin = jnp.concatenate([cache_entry.astype(x.dtype), x], axis=1)
    y = jax.lax.conv_general_dilated(
        xin, p["time_conv"]["w"], window_strides=(2, 1, 1),
        padding=((0, 0), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p["time_conv"]["b"]
    return y, x[:, -1:]


# ============================================================ init

def _conv3d_init(key, cin, cout, kernel, dtype):
    fan_in = cin * int(np.prod(kernel))
    lim = 1 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (*kernel, cin, cout), dtype, -lim, lim),
        "b": jax.random.uniform(k2, (cout,), dtype, -lim, lim),
    }


def _conv2d_init(key, cin, cout, kernel, dtype):
    fan_in = cin * kernel * kernel
    lim = 1 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (kernel, kernel, cin, cout), dtype, -lim, lim),
        "b": jax.random.uniform(k2, (cout,), dtype, -lim, lim),
    }


def _res_init(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": jnp.ones((cin,), dtype),
        "conv1": _conv3d_init(ks[0], cin, cout, (3, 3, 3), dtype),
        "norm2": jnp.ones((cout,), dtype),
        "conv2": _conv3d_init(ks[1], cout, cout, (3, 3, 3), dtype),
    }
    if cin != cout:
        p["shortcut"] = _conv3d_init(ks[2], cin, cout, (1, 1, 1), dtype)
    return p


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 2)
    lim = 1 / math.sqrt(c)
    return {
        "norm": jnp.ones((c,), dtype),
        "to_qkv": {
            "w": jax.random.uniform(ks[0], (c, 3 * c), dtype, -lim, lim),
            "b": jnp.zeros((3 * c,), dtype),
        },
        "proj": {  # zero-init (vae.py:238)
            "w": jnp.zeros((c, c), dtype),
            "b": jnp.zeros((c,), dtype),
        },
    }


def init_params(key: jax.Array, cfg: VAEConfig = WAN_VAE,
                dtype=jnp.float32) -> Params:
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    ks = iter(jax.random.split(key, 64))

    # ---- encoder
    enc: Params = {"conv1": _conv3d_init(next(ks), 3, dims[0], (3, 3, 3), dtype)}
    stages = []
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        blocks = []
        c = cin
        for _ in range(cfg.num_res_blocks):
            blocks.append(_res_init(next(ks), c, cout, dtype))
            c = cout
        stage = {"blocks": blocks}
        if i != len(cfg.dim_mult) - 1:
            stage["resample"] = {
                "conv": _conv2d_init(next(ks), cout, cout, 3, dtype)}
            if cfg.temperal_downsample[i]:
                stage["resample"]["time_conv"] = _conv3d_init(
                    next(ks), cout, cout, (3, 1, 1), dtype)
        stages.append(stage)
    enc["stages"] = stages
    z2 = cfg.z_dim * 2
    enc["mid_res1"] = _res_init(next(ks), dims[-1], dims[-1], dtype)
    enc["mid_attn"] = _attn_init(next(ks), dims[-1], dtype)
    enc["mid_res2"] = _res_init(next(ks), dims[-1], dims[-1], dtype)
    enc["head_norm"] = jnp.ones((dims[-1],), dtype)
    enc["head_conv"] = _conv3d_init(next(ks), dims[-1], z2, (3, 3, 3), dtype)

    # ---- decoder
    ddims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    dec: Params = {"conv1": _conv3d_init(next(ks), cfg.z_dim, ddims[0], (3, 3, 3), dtype)}
    dec["mid_res1"] = _res_init(next(ks), ddims[0], ddims[0], dtype)
    dec["mid_attn"] = _attn_init(next(ks), ddims[0], dtype)
    dec["mid_res2"] = _res_init(next(ks), ddims[0], ddims[0], dtype)
    stages = []
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i in (1, 2, 3):
            cin = cin // 2   # previous upsample halved channels (vae.py:401-404)
        blocks = []
        c = cin
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_res_init(next(ks), c, cout, dtype))
            c = cout
        stage = {"blocks": blocks}
        if i != len(cfg.dim_mult) - 1:
            stage["resample"] = {
                "conv": _conv2d_init(next(ks), cout, cout // 2, 3, dtype)}
            if cfg.temperal_upsample[i]:
                stage["resample"]["time_conv"] = _conv3d_init(
                    next(ks), cout, cout * 2, (3, 1, 1), dtype)
        stages.append(stage)
    dec["stages"] = stages
    dec["head_norm"] = jnp.ones((ddims[-1],), dtype)
    dec["head_conv"] = _conv3d_init(next(ks), ddims[-1], 3, (3, 3, 3), dtype)

    return {
        "encoder": enc,
        "conv1": _conv3d_init(next(ks), z2, z2, (1, 1, 1), dtype),
        "conv2": _conv3d_init(next(ks), cfg.z_dim, cfg.z_dim, (1, 1, 1), dtype),
        "decoder": dec,
    }


# ============================================================ decoder pass

def _decoder_pass(p: Params, cfg: VAEConfig, x: jax.Array, cache: list,
                  first: bool):
    """Decoder3d.forward (vae.py:423-472); cache consumed in visit order."""
    ci = iter(range(len(cache)))
    new_cache = list(cache)

    def take(fn, x, n_slots, *a):
        idxs = [next(ci) for _ in range(n_slots)]
        out, new = fn(x, [cache[i] for i in idxs], *a)
        for i, c in zip(idxs, new):
            new_cache[i] = c
        return out

    x, c = causal_conv3d(p["conv1"], x, cache[next(ci)])
    new_cache[0] = c

    x = take(lambda x, cc: residual_block(p["mid_res1"], x, cc), x, 2)
    x = attention_block(p["mid_attn"], x)
    x = take(lambda x, cc: residual_block(p["mid_res2"], x, cc), x, 2)

    for i, stage in enumerate(p["stages"]):
        for bp in stage["blocks"]:
            x = take(lambda x, cc, bp=bp: residual_block(bp, x, cc), x, 2)
        if "resample" in stage:
            if "time_conv" in stage["resample"]:
                idx = next(ci)
                x, nc = upsample3d(stage["resample"], x, cache[idx], first)
                new_cache[idx] = nc
            else:
                x = _spatial_resample_up(stage["resample"], x)

    x = rms_norm_channel(p["head_norm"], x)
    x = jax.nn.silu(x)
    idx = next(ci)
    x, nc = causal_conv3d(p["head_conv"], x, cache[idx])
    new_cache[idx] = nc
    return x, new_cache


def init_decoder_cache(params: Params, cfg: VAEConfig, batch: int,
                       latent_h: int, latent_w: int, dtype=jnp.float32) -> list:
    """Zero caches in decoder visit order with exact shapes — plays the role
    of demo_utils/constant.py's ZERO_VAE_CACHE."""
    h, w = latent_h, latent_w
    cache = []
    p = params["decoder"]

    def conv_cache(c):
        # cache holds the last CACHE_T *input* frames of each causal conv
        cache.append(jnp.zeros((batch, CACHE_T, h, w, c), dtype))

    conv_cache(p["conv1"]["w"].shape[-2])            # decoder conv1 (z ch)
    for res in (p["mid_res1"], p["mid_res2"]):
        conv_cache(res["conv1"]["w"].shape[-2])
        conv_cache(res["conv2"]["w"].shape[-2])

    for stage in p["stages"]:
        for bp in stage["blocks"]:
            conv_cache(bp["conv1"]["w"].shape[-2])
            conv_cache(bp["conv2"]["w"].shape[-2])
        if "resample" in stage:
            if "time_conv" in stage["resample"]:
                conv_cache(stage["resample"]["time_conv"]["w"].shape[-2])
            h, w = h * 2, w * 2
    conv_cache(p["head_conv"]["w"].shape[-2])
    return cache


def pad_decoder_channels(params: Params, align: int = 128) -> Params:
    """EXACT rewrite of the decoder's final stage with channel widths
    padded up to ``align`` (the TPU lane width).

    Measured on v5e: XLA's conv3d at 480x832 runs 30 TF/s with 96
    channels but 119 TF/s with 128 — padding is 2.2x faster in wall
    clock despite 1.78x more FLOPs (PERF.md).  The rewrite is exact:
    zero-padded channels stay exactly zero through conv (zero out-channel
    weights), silu(0)=0, and residual adds; the channel RMS norm's
    sqrt(C) factor is compensated by scaling gamma by sqrt(C_true/C_pad)
    (padded zeros don't change the sum of squares).

    Pads only widths < align (the 96-wide stage; 192/384 already run at
    80+ TF/s).  Decoder caches size themselves from the padded weights.
    """
    dec = params["decoder"]
    stages = dec["stages"]
    C = stages[-1]["blocks"][-1]["conv2"]["w"].shape[-1]
    if C % align == 0 or C > align:
        return params
    Cp = align
    scale = math.sqrt(C / Cp)

    def pad_axis(a, axis, size):
        cfg_ = [(0, 0)] * a.ndim
        cfg_[axis] = (0, size - a.shape[axis])
        return jnp.pad(a, cfg_)

    def pad_conv(p, cin, cout):
        q = dict(p)
        q["w"] = pad_axis(pad_axis(p["w"], p["w"].ndim - 2, cin),
                          p["w"].ndim - 1, cout)
        if "b" in p:
            q["b"] = pad_axis(p["b"], 0, cout)
        return q

    def pad_norm(g):
        return pad_axis(g * scale, 0, Cp)

    # fresh containers sharing the unmodified leaves (safe to mutate)
    out = jax.tree.map(lambda x: x, params)
    dec = out["decoder"]
    last = dec["stages"][-1]
    # the upsample conv feeding the final stage emits the padded width
    feeder = dec["stages"][-2]["resample"]["conv"]
    dec["stages"][-2]["resample"]["conv"] = pad_conv(
        feeder, feeder["w"].shape[-2], Cp)
    for bp in last["blocks"]:
        cin = bp["conv1"]["w"].shape[-2]
        bp["norm1"] = pad_norm(bp["norm1"])
        bp["conv1"] = pad_conv(bp["conv1"], Cp if cin == C else cin, Cp)
        bp["norm2"] = pad_norm(bp["norm2"])
        bp["conv2"] = pad_conv(bp["conv2"], Cp, Cp)
        if bp.get("shortcut"):
            bp["shortcut"] = pad_conv(bp["shortcut"],
                                      Cp if cin == C else cin, Cp)
    dec["head_norm"] = pad_norm(dec["head_norm"])
    dec["head_conv"] = pad_conv(dec["head_conv"], Cp,
                                dec["head_conv"]["w"].shape[-1])
    return out


def decode_frame(params: Params, cfg: VAEConfig, z: jax.Array, cache: list,
                 first: bool):
    """Decode one latent frame [B, 1, h, w, z] -> pixels + new cache.
    (Also accepts T>1 — every primitive is T-general.  A whole-block
    T>1 "sequence decode" mode existed through round 2 and measured 20%
    SLOWER than the per-frame scan on v5e — the decoder is
    fusion/bandwidth-bound, not dispatch-bound; PERF.md.  Removed.)

    First frame yields 1 pixel frame; steady state 2^(#temporal upsamples)
    (= 4 for Wan).  Mirrors WanVAE_.decode's frame loop (vae.py:545-569).
    """
    zc = z.shape[-1]
    # invert encode's (mu - mean)/std: z*std + mean (wrapper scale[1] is
    # 1/std and the reference decode divides by IT, wan_wrapper.py:102 +
    # vae.py:545-552 — i.e. multiplies by std)
    x = z * jnp.asarray(LATENT_STD[:zc], z.dtype) \
        + jnp.asarray(LATENT_MEAN[:zc], z.dtype)
    x, _ = causal_conv3d(params["conv2"], x, None, kernel=(1, 1, 1))
    return _decoder_pass(params["decoder"], cfg, x, cache, first)


def decode_block(params: Params, cfg: VAEConfig, z: jax.Array, cache: list,
                 first: bool, unroll: int | bool = 1):
    """Decode a multi-frame latent block in ONE call (lax.scan over frames
    inside jit) — the streaming serving path wants one dispatch per block,
    not one per frame (demo_utils/vae_block3.py's role).

    z: [B, T, h, w, zc]; returns (pixels [B, T*4(-3 if first), H, W, 3],
    new_cache).  ``unroll`` forwards to the per-frame lax.scan.
    """
    B, T = z.shape[:2]
    outs = []
    if first:
        out0, cache = decode_frame(params, cfg, z[:, :1], cache, first=True)
        outs.append(out0)
        z = z[:, 1:]
        T -= 1
    if T > 0:
        # scan per latent frame: bounds full-res activations for large
        # blocks (whole-block sequence decode measured slower; PERF.md)
        def step(cache, zf):
            y, cache = decode_frame(params, cfg, zf[:, None], cache,
                                    first=False)
            return cache, y

        cache, ys = jax.lax.scan(step, cache, z.transpose(1, 0, 2, 3, 4),
                                 unroll=unroll)
        ys = ys.transpose(1, 0, 2, 3, 4, 5).reshape(
            B, -1, *ys.shape[3:])
        outs.append(ys)
    return jnp.concatenate(outs, axis=1), cache


def decode(params: Params, cfg: VAEConfig, latents: jax.Array) -> jax.Array:
    """latents [B, T, h, w, z] -> pixels [B, 1+(T-1)*4, H, W, 3] in [-1, 1].

    Python loop over the first frame + lax.scan over the rest (the hot
    streaming path compiles two programs total).  For streaming with a
    carried cache across calls use decode_frame directly (see
    pipelines/streaming).
    """
    B, T, h, w, _ = latents.shape
    cache = init_decoder_cache(params, cfg, B, h, w, latents.dtype)

    out0, cache = decode_frame(params, cfg, latents[:, :1], cache, first=True)

    if T == 1:
        return jnp.clip(out0, -1.0, 1.0)

    def step(cache, z):
        y, cache = decode_frame(params, cfg, z[:, None], cache, first=False)
        return cache, y

    zs = latents[:, 1:].transpose(1, 0, 2, 3, 4)  # [T-1, B, h, w, z]
    cache, outs = jax.lax.scan(step, cache, zs)
    # outs: [T-1, B, 4, H, W, 3] -> [B, (T-1)*4, H, W, 3]
    outs = outs.transpose(1, 0, 2, 3, 4, 5).reshape(
        B, -1, *outs.shape[3:])
    return jnp.clip(jnp.concatenate([out0, outs], axis=1), -1.0, 1.0)


# ============================================================ encoder pass

def _encoder_pass(p: Params, cfg: VAEConfig, x: jax.Array, cache: list,
                  first: bool):
    ci = iter(range(len(cache)))
    new_cache = list(cache)

    def take_res(bp, x):
        i0, i1 = next(ci), next(ci)
        x, new = residual_block(bp, x, [cache[i0], cache[i1]])
        new_cache[i0], new_cache[i1] = new
        return x

    idx = next(ci)
    x, nc = causal_conv3d(p["conv1"], x, cache[idx])
    new_cache[idx] = nc

    for i, stage in enumerate(p["stages"]):
        for bp in stage["blocks"]:
            x = take_res(bp, x)
        if "resample" in stage:
            if "time_conv" in stage["resample"]:
                idx = next(ci)
                x, nc = downsample3d(stage["resample"], x, cache[idx], first)
                new_cache[idx] = nc
            else:
                x = _spatial_resample_down(stage["resample"], x)

    x = take_res(p["mid_res1"], x)
    x = attention_block(p["mid_attn"], x)
    x = take_res(p["mid_res2"], x)

    x = rms_norm_channel(p["head_norm"], x)
    x = jax.nn.silu(x)
    idx = next(ci)
    x, nc = causal_conv3d(p["head_conv"], x, cache[idx])
    new_cache[idx] = nc
    return x, new_cache


def init_encoder_cache(params: Params, cfg: VAEConfig, batch: int,
                       height: int, width: int, dtype=jnp.float32) -> list:
    h, w = height, width
    cache = []
    p = params["encoder"]

    def conv_cache(c, frames=CACHE_T):
        cache.append(jnp.zeros((batch, frames, h, w, c), dtype))

    conv_cache(p["conv1"]["w"].shape[-2])   # 3 input channels
    for stage in p["stages"]:
        for bp in stage["blocks"]:
            conv_cache(bp["conv1"]["w"].shape[-2])
            conv_cache(bp["conv2"]["w"].shape[-2])
        if "resample" in stage:
            h, w = h // 2, w // 2
            if "time_conv" in stage["resample"]:
                # downsample3d caches one post-spatial-resample frame
                cout = stage["resample"]["time_conv"]["w"].shape[-2]
                cache.append(jnp.zeros((batch, 1, h, w, cout), dtype))
    for res in (p["mid_res1"], p["mid_res2"]):
        conv_cache(res["conv1"]["w"].shape[-2])
        conv_cache(res["conv2"]["w"].shape[-2])
    conv_cache(p["head_conv"]["w"].shape[-2])
    return cache


def encode_chunk(params: Params, cfg: VAEConfig, x: jax.Array, cache: list,
                 first: bool):
    """Encode one pixel chunk ([B,1,...] first, then [B,4,...]) to one
    latent frame. Returns unnormalized mu (scaling applied by encode())."""
    return _encoder_pass(params["encoder"], cfg, x, cache, first)


def encode(params: Params, cfg: VAEConfig, pixels: jax.Array) -> jax.Array:
    """pixels [B, T, H, W, 3], T = 1 + 4k -> latents [B, 1+k, h, w, z],
    normalized by the Wan latent mean/std (wan_wrapper.py:78-92).

    Mirrors the reference's 1+4k chunking (vae.py:517-543).
    """
    B, T, H, W, _ = pixels.shape
    assert (T - 1) % 4 == 0, "pixel frame count must be 1 + 4k"
    cache = init_encoder_cache(params, cfg, B, H, W, pixels.dtype)

    out0, cache = encode_chunk(params, cfg, pixels[:, :1], cache, first=True)

    outs = [out0]
    if T > 1:
        def step(cache, xc):
            y, cache = encode_chunk(params, cfg, xc, cache, first=False)
            return cache, y

        xs = pixels[:, 1:].reshape(B, (T - 1) // 4, 4, H, W, 3)
        xs = xs.transpose(1, 0, 2, 3, 4, 5)
        cache, rest = jax.lax.scan(step, cache, xs)
        rest = rest.transpose(1, 0, 2, 3, 4, 5).reshape(
            B, -1, *rest.shape[3:])
        outs.append(rest)

    moments = jnp.concatenate(outs, axis=1)
    moments, _ = causal_conv3d(params["conv1"], moments, None,
                               kernel=(1, 1, 1))
    mu = jnp.split(moments, 2, axis=-1)[0]
    zc = mu.shape[-1]
    return (mu - jnp.asarray(LATENT_MEAN[:zc], mu.dtype)) / jnp.asarray(
        LATENT_STD[:zc], mu.dtype)
