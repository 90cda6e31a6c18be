"""Quantized linears — the demo's FP8-linear speed toggle (reference
torchao quantize_ Float8DynamicActivationFloat8WeightConfig,
demo.py:277-283), realized TPU-natively.

Three modes, all symmetric:

- ``w8`` (weight-only): int8 weights per-output-channel, activations stay
  bf16; the matmul runs as int8-rhs dot_general with the dequant fused in.
  No MXU speedup (the int8 MXU path needs BOTH operands int8) — it is a
  memory-footprint option.
- ``w8a8`` (dynamic activation + weight, default on v5e): activations
  quantized per-token at runtime, weights per-output-channel; the matmul
  runs int8 x int8 -> int32 on the MXU's native int8 path.  Measured on
  v5e: 206 TOP/s at [4608,1536]x[1536,1536] vs 95 TF/s for the same bf16
  matmul (2.17x) — mirroring the 2x int8:bf16 peak ratio (394:197).
- ``fp8`` (dynamic e4m3 activation + e4m3 weight — the literal torchao
  analog, v6e chip default in ops/chip.py): both operands cast to
  float8_e4m3fn with the same per-token / per-output-channel scale
  structure as w8a8, matmul via ``dot_general(..., f32)`` which XLA
  lowers onto the v6e MXU's native fp8 path (~2x bf16 peak; v5e has no
  fp8 MXU — there XLA upcasts and this mode is numerics-only).  fp8
  needs no Pallas epilogue kernel: the f32 accumulator comes out of the
  dot directly, so the scale/bias epilogue is an ordinary XLA fusion
  (the int8 kernels exist because the int32 accumulator round-trip is
  what was expensive, pallas_matmul.py:1-16).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Params = dict


def _quantize_weight(w: jax.Array, axis: int):
    """Per-output-channel symmetric int8: returns (w_q int8, scale f32)."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=axis) / 127.0, 1e-8)
    w_q = jnp.clip(jnp.round(wf / jnp.expand_dims(scale, axis)),
                   -127, 127).astype(jnp.int8)
    return w_q, scale


FP8_MAX = 448.0  # float8_e4m3fn largest finite


def _quantize_weight_fp8(w: jax.Array, axis: int):
    """Per-output-channel symmetric e4m3: returns (w_f8, scale f32)."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=axis) / FP8_MAX, 1e-8)
    w_f8 = (wf / jnp.expand_dims(scale, axis)).astype(jnp.float8_e4m3fn)
    return w_f8, scale


def quantize_linear_params(p: Params, mode: str = "w8a8") -> Params:
    """{'w': [in, out] float} -> {'w_q'|'w_qa': int8 | 'w_f8': e4m3,
    'w_scale': f32, ...}.

    Stacked-block weights [L, in, out] are quantized along axis 1.
    """
    if "lora_A" in p:
        # quantized_linear does not apply LoRA deltas — quantizing an
        # unmerged adapter would silently revert to base-model behavior.
        # Merge first (lora.merge_lora / scripts/merge_lora.py).
        raise ValueError("cannot quantize a linear with unmerged LoRA "
                         "params; merge the adapter first")
    w = p["w"]
    axis = w.ndim - 2
    out = {k: v for k, v in p.items() if k != "w"}
    if mode == "fp8":
        out["w_f8"], out["w_scale"] = _quantize_weight_fp8(w, axis)
        return out
    w_q, scale = _quantize_weight(w, axis)
    out["w_qa" if mode == "w8a8" else "w_q"] = w_q
    out["w_scale"] = scale
    return out


def quantize_activations(x: jax.Array):
    """Dynamic per-token (last-axis) symmetric int8: (x_q, scale[..., 1])."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                    1e-8)
    x_q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return x_q, s


def quantize_activations_fp8(x: jax.Array):
    """Dynamic per-token symmetric e4m3: (x_f8, scale[..., 1])."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / FP8_MAX,
                    1e-8)
    return (xf / s).astype(jnp.float8_e4m3fn), s


def _use_pallas() -> bool:
    from self_forcing_tpu.ops import attention
    return attention._use_pallas()


def quantized_linear(p: Params, x: jax.Array) -> jax.Array:
    """Dispatch on the quantized-weight key.

    w8:   x @ dequant(w_q) with the dequant fused: (x @ w_q) * scale.
    w8a8: quant(x) @ w_qa in int8 (int32 accum), scaled by s_x * w_scale;
          on TPU via the Pallas fused-epilogue kernel (ops/pallas_matmul).
    fp8:  quant_fp8(x) @ w_f8 via dot_general(e4m3, e4m3) -> f32 — the
          v6e-native path (XLA fuses the scale/bias epilogue; no custom
          kernel needed, see module docstring).
    """
    if "w_f8" in p:
        x_f8, s_x = quantize_activations_fp8(x)
        y = jax.lax.dot_general(
            x_f8, p["w_f8"],
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y * (s_x * p["w_scale"])
        if "b" in p:
            y = y + p["b"].astype(jnp.float32)
        return y.astype(x.dtype)
    if "w_qa" in p:
        lead = x.shape[:-1]
        K = x.shape[-1]
        if _use_pallas():
            from self_forcing_tpu.ops.pallas_matmul import (
                quantize_rows_pallas, w8a8_matmul)
            # one-pass Pallas quantization (the XLA chain costs ~2.3 ms
            # at [4680, 1536]; XLA CSEs this call across q/k/v which
            # share an input).  w8a8_matmul's tiling decision depends
            # only on (M, K, N), so when it declines there is no point
            # re-trying it with differently-quantized activations.
            q2 = quantize_rows_pallas(x.reshape(-1, K))
            if q2 is not None:
                x_q2, s128 = q2
                y = w8a8_matmul(x_q2, s128, p["w_qa"], p["w_scale"],
                                p.get("b"), out_dtype=x.dtype)
                if y is not None:
                    return y.reshape(*lead, y.shape[-1])
                # XLA-dot fallback reuses the Pallas quantization (the
                # scale is lane-broadcast: column 0 is the value)
                x_q = x_q2.reshape(*lead, K)
                s_x = s128[:, :1].reshape(*lead, 1)
            else:
                # quantize kernel declined the shape; the raw-bf16 matmul
                # (in-kernel quantization) or the int8 matmul with
                # XLA-quantized activations may still take it
                from self_forcing_tpu.ops.pallas_matmul import (
                    w8a8_matmul_bf16x)
                y = w8a8_matmul_bf16x(x.reshape(-1, K), p["w_qa"],
                                      p["w_scale"], p.get("b"),
                                      out_dtype=x.dtype)
                if y is not None:
                    return y.reshape(*lead, y.shape[-1])
                x_q, s_x = quantize_activations(x)
                y = w8a8_matmul(
                    x_q.reshape(-1, K), s_x.reshape(-1, 1),
                    p["w_qa"], p["w_scale"], p.get("b"), out_dtype=x.dtype)
                if y is not None:
                    return y.reshape(*lead, y.shape[-1])
        else:
            x_q, s_x = quantize_activations(x)
        y = jax.lax.dot_general(
            x_q, p["w_qa"],
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (s_x * p["w_scale"])
    else:
        y = jax.lax.dot_general(
            x, p["w_q"],
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y * p["w_scale"]
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def quantized_ffn(p1: Params, p2: Params, x: jax.Array) -> jax.Array:
    """fc2(gelu(fc1(x))) with both linears W8A8 and the whole
    between-matmul chain (dequant, bias, gelu, re-quantization) fused
    into the Pallas kernels' epilogues (ops/pallas_matmul.w8a8_ffn).

    The hidden activation is group-quantized (group = fc2 k-tile, 896 at
    Wan geometry) — finer than the per-token scale of the unfused path,
    so at least as accurate.  Off-TPU falls back to the two-call
    per-token path (reference semantics, demo.py:277-283)."""
    from self_forcing_tpu.models.wan.dit import gelu_tanh
    if "w_qa" in p1 and "w_qa" in p2 and _use_pallas():
        from self_forcing_tpu.ops.pallas_matmul import w8a8_ffn
        lead = x.shape[:-1]
        K = x.shape[-1]
        # s_x=None: fc1 quantizes its input in-kernel when K fits one
        # tile; otherwise pre-quantize in XLA
        y = w8a8_ffn(x.reshape(-1, K), None,
                     p1["w_qa"], p1["w_scale"], p1.get("b"),
                     p2["w_qa"], p2["w_scale"], p2.get("b"),
                     out_dtype=x.dtype)
        if y is None:
            x_q, s_x = quantize_activations(x)
            y = w8a8_ffn(x_q.reshape(-1, K), s_x.reshape(-1, 1),
                         p1["w_qa"], p1["w_scale"], p1.get("b"),
                         p2["w_qa"], p2["w_scale"], p2.get("b"),
                         out_dtype=x.dtype)
        if y is not None:
            return y.reshape(*lead, y.shape[-1])
    return quantized_linear(p2, gelu_tanh(quantized_linear(p1, x)))


def _fuse_qkv(sa: Params) -> Params:
    """Concatenate the self-attention q/k/v projections into one
    [in, 3*out] linear under the key ``qkv`` (models/wan/dit.py splits
    the output).  Per-output-channel weight scales and the per-token
    activation scale are both preserved exactly, so the fused int8
    matmul is bit-identical to the three separate ones — it just runs
    as ONE MXU dispatch with one epilogue pass (the K=1536 shapes are
    epilogue-amortization-bound; PERF.md)."""
    q, k, v = sa["q"], sa["k"], sa["v"]
    if any("lora_A" in p for p in (q, k, v)):
        raise ValueError("cannot fuse q/k/v with unmerged LoRA params; "
                         "merge the adapter first")
    fused = {"w": jnp.concatenate([q["w"], k["w"], v["w"]], axis=-1)}
    if "b" in q:
        fused["b"] = jnp.concatenate([q["b"], k["b"], v["b"]], axis=-1)
    out = {kk: vv for kk, vv in sa.items() if kk not in ("q", "k", "v")}
    out["qkv"] = fused
    return out


def quantize_dit_params(params: Params, min_dim: int = 512,
                        mode: str = "w8a8",
                        fuse_qkv: bool = True) -> Params:
    """Quantize every big linear in the DiT block stack (q/k/v/o, ffn).

    Embeddings, norms, modulation, and the output head stay bf16 — same
    set the reference's FP8 path touches (filter_fn on nn.Linear,
    demo.py:281-283).  ``fuse_qkv`` additionally merges the three
    self-attention projections into one matmul (exact; see _fuse_qkv).
    """
    def walk(node):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) >= 2 \
                    and node["w"].shape[-2] >= min_dim \
                    and node["w"].shape[-1] >= min_dim:
                return quantize_linear_params(node, mode)
            return {k: walk(v) for k, v in node.items()}
        return node

    blocks = params["blocks"]
    sa = blocks.get("self_attn", {})
    if fuse_qkv and all(k in sa for k in ("q", "k", "v")):
        blocks = dict(blocks)
        blocks["self_attn"] = _fuse_qkv(sa)
    out = dict(params)
    out["blocks"] = walk(blocks)
    return out
