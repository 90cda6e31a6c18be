"""TAEHV — Tiny AutoEncoder fast decoder (reference demo_utils/taehv.py,
taew2_1 weights for Wan 2.1 latents).

TPU-native redesign:
- channels-last [N, T, H, W, C]; convs are NHWC with T folded into batch.
- The reference's sequential mode is a *work-queue graph traversal*
  (taehv.py:60-157) because TPool/TGrow change the frame count mid-stack.
  Here the parallel mode is the only mode: MemBlock memory is the input
  shifted by one frame (zeros at t=0), which XLA fuses into the conv —
  O(T) memory is fine for the 3-latent chunks the demo feeds
  (demo.py:423-435), and the streaming overlap trick handles continuity.
- Decoder stack (taehv.py:181-190): Clamp -> conv(16,256) -> 3x MemBlock
  -> [up2x, TGrow(1), conv->128] -> 3x MemBlock -> [up2x, TGrow(2),
  conv->64] -> 3x MemBlock -> [up2x, TGrow(2), conv->64] -> ReLU ->
  conv(64,3).  Temporal upscale 4x, trims 2^2-1=3 leading frames.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = dict
LATENT_CHANNELS = 16
IMAGE_CHANNELS = 3
N_F = (256, 128, 64, 64)


def _conv_q(p, x, stride, pad):
    """W8A8 int8 conv (opt-in, quantize_decoder_params): dynamic
    per-tensor activation scale x per-output-channel weight scales,
    s8 x s8 -> s32 on the conv MXU path — the TAEHV analog of the demo
    DiT's int8 linears (ops/quant.py; reference demo.py:277-283)."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, p["w_q"], (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * p["w_scale"])
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _conv(p, x, stride=1):
    """3x3 NHWC conv, padding 1."""
    if "w_q" in p:
        return _conv_q(p, x, stride, ((1, 1), (1, 1)))
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"]
    return y


def _conv1x1(p, x):
    if "w_q" in p:
        return _conv_q(p, x, 1, ((0, 0), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"]
    return y


def quantize_decoder_params(params: Params) -> Params:
    """int8 W8A8 conv weights for the fast decoder (opt-in speed toggle;
    per-output-channel symmetric scales, exactly ops/quant.py's weight
    scheme applied to HWIO convs).  The decoder is conv-bound at C=64
    full-res stages — int8 halves both the MXU floor and the operand
    bandwidth.  Measure before making it a default: VAE-class convs on
    v5e have repeatedly been glue-bound, not MXU-bound (PERF.md)."""
    def walk(node):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 4:
                w = node["w"].astype(jnp.float32)
                s = jnp.maximum(
                    jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-8)
                out = {"w_q": jnp.clip(jnp.round(w / s), -127,
                                       127).astype(jnp.int8),
                       "w_scale": s}
                if "b" in node:
                    out["b"] = node["b"]
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def _memblock(p, x, mem):
    """MemBlock (taehv.py:25-34): conv([x | past]) + skip(x), ReLU."""
    h = jnp.concatenate([x, mem], axis=-1)
    h = jax.nn.relu(_conv(p["conv0"], h))
    h = jax.nn.relu(_conv(p["conv1"], h))
    h = _conv(p["conv2"], h)
    skip = _conv1x1(p["skip"], x) if "skip" in p else x
    return jax.nn.relu(h + skip)


def _shift_mem(x5):
    """[N, T, H, W, C] -> same with frames shifted +1, zeros first
    (taehv.py:83-85)."""
    return jnp.pad(x5, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]


def _up2(h, s):
    """Nearest sxs spatial upsample of [N, T, H, W, C] via
    broadcast+reshape (jnp.repeat can lower to a gather; the broadcast
    form is always a layout-level copy)."""
    N_, T_, H_, W_, C_ = h.shape
    h = jnp.broadcast_to(h[:, :, :, None, :, None, :],
                         (N_, T_, H_, s, W_, s, C_))
    return h.reshape(N_, T_, H_ * s, W_ * s, C_)


# decoder spec: (kind, param_key or None, extra)
# NOTE vs the reference stack order (taehv.py:181-190: up -> TGrow ->
# conv): TGrow is a 1x1 conv and the upsample a nearest-neighbor repeat
# — per-pixel ops on disjoint axes, so they COMMUTE exactly.  Running
# TGrow BEFORE the 2x2 spatial repeat does its matmul+traffic at 1/4 the
# pixels (bit-identical output; the torch goldens pin it).
_DECODER_SPEC = (
    ("clamp", None, None),
    ("conv", "conv_in", None),        # 16 -> 256
    ("relu", None, None),
    ("mem", "mem0_0", None), ("mem", "mem0_1", None), ("mem", "mem0_2", None),
    ("tgrow", "tgrow0", 1), ("up", None, 2), ("conv", "conv0", None),
    ("mem", "mem1_0", None), ("mem", "mem1_1", None), ("mem", "mem1_2", None),
    ("tgrow", "tgrow1", 2), ("up", None, 2), ("conv", "conv1", None),
    ("mem", "mem2_0", None), ("mem", "mem2_1", None), ("mem", "mem2_2", None),
    ("tgrow", "tgrow2", 2), ("up", None, 2), ("conv", "conv2", None),
    ("relu", None, None),
    ("conv", "conv_out", None),       # 64 -> 3
)

FRAMES_TO_TRIM = 3  # 2**2 - 1 (taehv.py:180)

# encoder stack (taehv.py:175-181): conv(3,64) -> [TPool(2), conv s2,
# 3x MemBlock] x2 -> [TPool(1), conv s2, 3x MemBlock] -> conv(64,16).
# Temporal downsample 4x, spatial 8x.
_ENCODER_SPEC = (
    ("conv", "enc_in", None),          # 3 -> 64
    ("relu", None, None),
    ("tpool", "tpool0", 2), ("conv_s2", "enc_conv0", None),
    ("mem", "emem0_0", None), ("mem", "emem0_1", None), ("mem", "emem0_2", None),
    ("tpool", "tpool1", 2), ("conv_s2", "enc_conv1", None),
    ("mem", "emem1_0", None), ("mem", "emem1_1", None), ("mem", "emem1_2", None),
    ("tpool", "tpool2", 1), ("conv_s2", "enc_conv2", None),
    ("mem", "emem2_0", None), ("mem", "emem2_1", None), ("mem", "emem2_2", None),
    ("conv", "enc_out", None),         # 64 -> 16
)


def encode_video(params: Params, x: jax.Array) -> jax.Array:
    """RGB [N, T, 3, H, W] in ~[0,1] -> latents [N, T/4, 16, H/8, W/8]
    (taehv.py:210-220 encode_video, parallel path).  T must be divisible
    by 4 (the reference's parallel reshape has the same requirement)."""
    N, T, C, H, W = x.shape
    if T % 4:
        raise ValueError(f"TAEHV encode needs T divisible by 4, got {T}")
    h = x.transpose(0, 1, 3, 4, 2)  # channels last [N, T, H, W, C]

    for kind, key, extra in _ENCODER_SPEC:
        if kind == "relu":
            h = jax.nn.relu(h)
        elif kind in ("conv", "conv_s2"):
            N_, T_ = h.shape[:2]
            flat = h.reshape((N_ * T_,) + h.shape[2:])
            flat = _conv(params[key], flat, stride=2 if kind == "conv_s2" else 1)
            h = flat.reshape((N_, T_) + flat.shape[1:])
        elif kind == "mem":
            N_, T_ = h.shape[:2]
            mem = _shift_mem(h)
            flat = h.reshape((N_ * T_,) + h.shape[2:])
            mflat = mem.reshape(flat.shape)
            flat = _memblock(params[key], flat, mflat)
            h = flat.reshape((N_, T_) + flat.shape[1:])
        elif kind == "tpool":
            # torch TPool (taehv.py:37-45): [NT, C, H, W] ->
            # [NT/stride, stride*C, H, W] 1x1 conv -> C; frame t of each
            # group lands in channel slot t (reshape groups consecutive
            # frames along channels).
            s = extra
            N_, T_, Hh, Ww, C_ = h.shape
            g = h.reshape(N_, T_ // s, s, Hh, Ww, C_)
            g = g.transpose(0, 1, 3, 4, 2, 5).reshape(N_, T_ // s, Hh, Ww, s * C_)
            flat = g.reshape((N_ * (T_ // s),) + g.shape[2:])
            flat = _conv1x1(params[key], flat)
            h = flat.reshape((N_, T_ // s) + flat.shape[1:])
    return h.transpose(0, 1, 4, 2, 3)


def decode_video(params: Params, x: jax.Array,
                 trim: bool = True) -> jax.Array:
    """latents [N, T, C=16, H, W] -> RGB [N, 4T(-3), 3, 8H, 8W] in ~[0,1]
    (taehv.py:224-236 parallel path)."""
    N, T, C, H, W = x.shape
    h = x.transpose(0, 1, 3, 4, 2)  # channels last [N, T, H, W, C]

    for kind, key, extra in _DECODER_SPEC:
        if kind == "clamp":
            h = jnp.tanh(h / 3.0) * 3.0
        elif kind == "relu":
            h = jax.nn.relu(h)
        elif kind == "conv":
            N_, T_ = h.shape[:2]
            flat = h.reshape((N_ * T_,) + h.shape[2:])
            flat = _conv(params[key], flat)
            h = flat.reshape((N_, T_) + flat.shape[1:])
        elif kind == "mem":
            N_, T_ = h.shape[:2]
            mem = _shift_mem(h)
            flat = h.reshape((N_ * T_,) + h.shape[2:])
            mflat = mem.reshape(flat.shape)
            flat = _memblock(params[key], flat, mflat)
            h = flat.reshape((N_, T_) + flat.shape[1:])
        elif kind == "up":
            h = _up2(h, extra)
        elif kind == "tgrow":
            # torch TGrow (taehv.py:48-57): [NT, stride*C, H, W] ->
            # [NT*stride, C, H, W] — channel group g becomes frame g.
            N_, T_ = h.shape[:2]
            C_ = h.shape[-1]
            flat = h.reshape((N_ * T_,) + h.shape[2:])
            y = _conv1x1(params[key], flat)        # [..., stride*C]
            Hh, Ww = y.shape[1:3]
            y = y.reshape(N_, T_, Hh, Ww, extra, C_)
            y = y.transpose(0, 1, 4, 2, 3, 5)
            h = y.reshape(N_, T_ * extra, Hh, Ww, C_)
    out = h.transpose(0, 1, 4, 2, 3)
    if trim:
        out = out[:, FRAMES_TO_TRIM:]
    return out


def decode_video_stateful(params: Params, x: jax.Array,
                          state: Params | None = None,
                          trim: bool = True
                          ) -> tuple[jax.Array, Params]:
    """Exact streaming decode: latents [N, T, 16, H, W] -> (RGB frames,
    carry state).

    The decoder's ONLY temporal mixing is the MemBlocks' one-frame
    lookback (taehv.py:25-34) — TGrow/upsample/convs are per-frame — so
    carrying each mem layer's last input frame (9 small tensors) makes
    chunked decoding EXACTLY equal to decoding the whole video at once:
    no 3-latent overlap re-decode (the reference demo's scheme,
    demo.py:423-435, costs 2x the decode FLOPs per steady chunk AND is
    only approximate — its re-decoded tail restarts from zero memory).

    ``state=None`` = first chunk (zero memory + trim the 3 warmup
    frames, like the one-shot decode); pass the returned state for the
    following chunks with trim=False.
    """
    N, T, C, H, W = x.shape
    h = x.transpose(0, 1, 3, 4, 2)  # channels last [N, T, H, W, C]
    new_state: Params = {}

    for kind, key, extra in _DECODER_SPEC:
        if kind == "clamp":
            h = jnp.tanh(h / 3.0) * 3.0
        elif kind == "relu":
            h = jax.nn.relu(h)
        elif kind == "conv":
            N_, T_ = h.shape[:2]
            flat = h.reshape((N_ * T_,) + h.shape[2:])
            flat = _conv(params[key], flat)
            h = flat.reshape((N_, T_) + flat.shape[1:])
        elif kind == "mem":
            N_, T_ = h.shape[:2]
            if state is None:
                mem = _shift_mem(h)
            else:
                mem = jnp.concatenate(
                    [state[key].astype(h.dtype), h[:, :-1]], axis=1)
            new_state[key] = h[:, -1:]
            flat = h.reshape((N_ * T_,) + h.shape[2:])
            mflat = mem.reshape(flat.shape)
            flat = _memblock(params[key], flat, mflat)
            h = flat.reshape((N_, T_) + flat.shape[1:])
        elif kind == "up":
            h = _up2(h, extra)
        elif kind == "tgrow":
            N_, T_ = h.shape[:2]
            C_ = h.shape[-1]
            flat = h.reshape((N_ * T_,) + h.shape[2:])
            y = _conv1x1(params[key], flat)
            Hh, Ww = y.shape[1:3]
            y = y.reshape(N_, T_, Hh, Ww, extra, C_)
            y = y.transpose(0, 1, 4, 2, 3, 5)
            h = y.reshape(N_, T_ * extra, Hh, Ww, C_)
    out = h.transpose(0, 1, 4, 2, 3)
    if trim:
        out = out[:, FRAMES_TO_TRIM:]
    return out, new_state


_STATEFUL_JIT = None


def _stateful_jit():
    """Shared jitted decode_video_stateful (one trace cache for all
    streamer instances — a per-instance jax.jit would re-trace per
    generation)."""
    global _STATEFUL_JIT
    if _STATEFUL_JIT is None:
        _STATEFUL_JIT = jax.jit(decode_video_stateful,
                                static_argnames=("trim",))
    return _STATEFUL_JIT


class TAEHVStreamer:
    """Streaming chunk decode.

    Default: the EXACT stateful path (decode_video_stateful — half the
    decode FLOPs of the reference demo's 3-latent overlap re-decode and
    bit-equal to a whole-video decode).  ``stateful=False`` reproduces
    the reference's overlap scheme (demo.py:423-435): keep the last
    `overlap` latent frames, re-decode [overlap | new] and drop the
    overlap's pixels."""

    def __init__(self, params: Params, overlap: int = 3, decode_fn=None,
                 stateful: bool = True):
        self.params = params
        self.overlap = overlap
        self.stateful = stateful
        self._tail = None
        self._state = None
        # injectable decode (e.g. a jitted decode_video) — same signature
        self._decode_fn = decode_fn or decode_video
        self._stateful_fn = _stateful_jit()

    def reset(self):
        self._tail = None
        self._state = None

    def decode_chunk(self, latents: jax.Array) -> jax.Array:
        """[N, T_new, 16, h, w] -> pixel frames for the new latents."""
        if self.stateful:
            out, self._state = self._stateful_fn(
                self.params, latents, self._state,
                trim=self._state is None)
            return out
        if self._tail is None:
            out = self._decode_fn(self.params, latents, trim=True)
            emitted_new = out
            joint = latents
        else:
            x = jnp.concatenate([self._tail, latents], axis=1)
            out = self._decode_fn(self.params, x, trim=True)
            # the first (tail_T*4 - trim) pixel frames re-decode the tail
            # (tail_T, not self.overlap: a short first chunk — e.g. the
            # 1-frame independent first block — leaves a shorter tail, and
            # skipping by the full overlap would drop fresh frames)
            skip = max(0, self._tail.shape[1] * 4 - FRAMES_TO_TRIM)
            emitted_new = out[:, skip:]
            joint = x
        # carry overlap context from [old tail | new], not the new chunk
        # alone — chunks shorter than the overlap must not shrink it
        self._tail = joint[:, -self.overlap:]
        return emitted_new


# ---------------------------------------------------------------- init

def _conv_init(key, cin, cout, k, dtype, bias=True):
    lim = 1 / math.sqrt(cin * k * k)
    p = {"w": jax.random.uniform(key, (k, k, cin, cout), dtype, -lim, lim)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def init_decoder_params(key: jax.Array, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 64))
    p: Params = {
        "conv_in": _conv_init(next(ks), LATENT_CHANNELS, N_F[0], 3, dtype)}
    for s, (cin, cout) in enumerate(zip(N_F[:-1], N_F[1:])):
        for m in range(3):
            p[f"mem{s}_{m}"] = {
                "conv0": _conv_init(next(ks), cin * 2, cin, 3, dtype),
                "conv1": _conv_init(next(ks), cin, cin, 3, dtype),
                "conv2": _conv_init(next(ks), cin, cin, 3, dtype),
            }
        stride = 1 if s == 0 else 2
        p[f"tgrow{s}"] = {"w": jax.random.normal(
            next(ks), (1, 1, cin, cin * stride)).astype(dtype) * 0.02}
        p[f"conv{s}"] = _conv_init(next(ks), cin, cout, 3, dtype, bias=False)
    p["conv_out"] = _conv_init(next(ks), N_F[-1], IMAGE_CHANNELS, 3, dtype)
    return p


def init_encoder_params(key: jax.Array, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 64))
    p: Params = {"enc_in": _conv_init(next(ks), IMAGE_CHANNELS, 64, 3, dtype)}
    for s, stride in enumerate((2, 2, 1)):
        p[f"tpool{s}"] = {"w": jax.random.normal(
            next(ks), (1, 1, 64 * stride, 64)).astype(dtype) * 0.02}
        p[f"enc_conv{s}"] = _conv_init(next(ks), 64, 64, 3, dtype, bias=False)
        for m in range(3):
            p[f"emem{s}_{m}"] = {
                "conv0": _conv_init(next(ks), 128, 64, 3, dtype),
                "conv1": _conv_init(next(ks), 64, 64, 3, dtype),
                "conv2": _conv_init(next(ks), 64, 64, 3, dtype),
            }
    p["enc_out"] = _conv_init(next(ks), 64, LATENT_CHANNELS, 3, dtype)
    return p


# ---------------------------------------------------------------- convert

def convert_taehv_state_dict(sd: Mapping[str, Any],
                             dtype=jnp.float32) -> Params:
    """taew2_1.pth decoder subtree -> pytree (keys decoder.{i}.*; torch
    OIHW -> HWIO).  TGrow kernels are patched like the reference when the
    checkpoint stride exceeds the configured one (taehv.py:196-208)."""
    def _np(t):
        return t if isinstance(t, np.ndarray) else \
            t.detach().to("cpu").float().numpy()

    def conv_p(i, bias=True):
        p = {"w": jnp.asarray(
            _np(sd[f"decoder.{i}.weight"]).transpose(2, 3, 1, 0), dtype)}
        if bias and f"decoder.{i}.bias" in sd:
            p["b"] = jnp.asarray(_np(sd[f"decoder.{i}.bias"]), dtype)
        return p

    def mem_p(i):
        base = f"decoder.{i}"
        p = {
            "conv0": {"w": jnp.asarray(_np(sd[base + ".conv.0.weight"])
                                       .transpose(2, 3, 1, 0), dtype),
                      "b": jnp.asarray(_np(sd[base + ".conv.0.bias"]), dtype)},
            "conv1": {"w": jnp.asarray(_np(sd[base + ".conv.2.weight"])
                                       .transpose(2, 3, 1, 0), dtype),
                      "b": jnp.asarray(_np(sd[base + ".conv.2.bias"]), dtype)},
            "conv2": {"w": jnp.asarray(_np(sd[base + ".conv.4.weight"])
                                       .transpose(2, 3, 1, 0), dtype),
                      "b": jnp.asarray(_np(sd[base + ".conv.4.bias"]), dtype)},
        }
        if base + ".skip.weight" in sd:
            p["skip"] = {"w": jnp.asarray(
                _np(sd[base + ".skip.weight"]).transpose(2, 3, 1, 0), dtype)}
        return p

    def tgrow_p(i, stride, cin):
        w = _np(sd[f"decoder.{i}.conv.weight"])  # [C*stride(ckpt), C, 1, 1]
        want = cin * stride
        if w.shape[0] > want:  # take last-timestep channels (taehv.py:204)
            w = w[-want:]
        return {"w": jnp.asarray(w.transpose(2, 3, 1, 0), dtype)}

    out = {
        "conv_in": conv_p(1),
        "mem0_0": mem_p(3), "mem0_1": mem_p(4), "mem0_2": mem_p(5),
        "tgrow0": tgrow_p(7, 1, N_F[0]), "conv0": conv_p(8, bias=False),
        "mem1_0": mem_p(9), "mem1_1": mem_p(10), "mem1_2": mem_p(11),
        "tgrow1": tgrow_p(13, 2, N_F[1]), "conv1": conv_p(14, bias=False),
        "mem2_0": mem_p(15), "mem2_1": mem_p(16), "mem2_2": mem_p(17),
        "tgrow2": tgrow_p(19, 2, N_F[2]), "conv2": conv_p(20, bias=False),
        "conv_out": conv_p(22),
    }
    if "encoder.0.weight" in sd:
        out.update(convert_taehv_encoder_state_dict(sd, dtype))
    return out


def convert_taehv_encoder_state_dict(sd: Mapping[str, Any],
                                     dtype=jnp.float32) -> Params:
    """taew2_1.pth encoder subtree -> pytree (keys encoder.{i}.*; layer
    indices from taehv.py:175-181)."""
    def _np(t):
        return t if isinstance(t, np.ndarray) else \
            t.detach().to("cpu").float().numpy()

    def conv_p(i, bias=True):
        p = {"w": jnp.asarray(
            _np(sd[f"encoder.{i}.weight"]).transpose(2, 3, 1, 0), dtype)}
        if bias and f"encoder.{i}.bias" in sd:
            p["b"] = jnp.asarray(_np(sd[f"encoder.{i}.bias"]), dtype)
        return p

    def mem_p(i):
        base = f"encoder.{i}"
        p = {}
        for j, name in ((0, "conv0"), (2, "conv1"), (4, "conv2")):
            p[name] = {
                "w": jnp.asarray(_np(sd[f"{base}.conv.{j}.weight"])
                                 .transpose(2, 3, 1, 0), dtype),
                "b": jnp.asarray(_np(sd[f"{base}.conv.{j}.bias"]), dtype)}
        if base + ".skip.weight" in sd:
            p["skip"] = {"w": jnp.asarray(
                _np(sd[base + ".skip.weight"]).transpose(2, 3, 1, 0), dtype)}
        return p

    def tpool_p(i):
        return {"w": jnp.asarray(
            _np(sd[f"encoder.{i}.conv.weight"]).transpose(2, 3, 1, 0), dtype)}

    return {
        "enc_in": conv_p(0),
        "tpool0": tpool_p(2), "enc_conv0": conv_p(3, bias=False),
        "emem0_0": mem_p(4), "emem0_1": mem_p(5), "emem0_2": mem_p(6),
        "tpool1": tpool_p(7), "enc_conv1": conv_p(8, bias=False),
        "emem1_0": mem_p(9), "emem1_1": mem_p(10), "emem1_2": mem_p(11),
        "tpool2": tpool_p(12), "enc_conv2": conv_p(13, bias=False),
        "emem2_0": mem_p(14), "emem2_1": mem_p(15), "emem2_2": mem_p(16),
        "enc_out": conv_p(17),
    }
