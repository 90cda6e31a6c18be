"""Weight-only int8 quantized linears — the demo's FP8-linear speed toggle
(reference torchao quantize_ Float8DynamicActivationFloat8WeightConfig,
demo.py:277-283), realized TPU-natively.

v5e has native int8 MXU throughput (2x bf16); weights are quantized
per-output-channel symmetric, activations stay bf16 and the matmul runs
as int8 weights x bf16 activations via dot_general with int8 rhs upcast
fused by XLA.  Quality tradeoff mirrors the reference's demo toggle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Params = dict


def quantize_linear_params(p: Params) -> Params:
    """{'w': [in, out] float} -> {'w_q': int8, 'w_scale': [out] f32, ...}."""
    w = p["w"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0          # [out]
    scale = jnp.maximum(scale, 1e-8)
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    out = {k: v for k, v in p.items() if k != "w"}
    out["w_q"] = w_q
    out["w_scale"] = scale
    return out


def quantized_linear(p: Params, x: jax.Array) -> jax.Array:
    """x @ dequant(w_q) + b with the dequant fused into the matmul:
    (x @ w_q) * scale."""
    y = jax.lax.dot_general(
        x, p["w_q"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y * p["w_scale"]
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_dit_params(params: Params, min_dim: int = 512) -> Params:
    """Quantize every big linear in the DiT block stack (q/k/v/o, ffn).

    Embeddings, norms, modulation, and the output head stay bf16 — same
    set the reference's FP8 path touches (filter_fn on nn.Linear,
    demo.py:281-283).
    """
    def walk(node):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) >= 2 \
                    and node["w"].shape[-2] >= min_dim \
                    and node["w"].shape[-1] >= min_dim:
                if node["w"].ndim == 3:   # stacked blocks [L, in, out]
                    w = node["w"].astype(jnp.float32)
                    scale = jnp.maximum(
                        jnp.max(jnp.abs(w), axis=1) / 127.0, 1e-8)  # [L, out]
                    w_q = jnp.clip(jnp.round(w / scale[:, None, :]),
                                   -127, 127).astype(jnp.int8)
                    out = {k: v for k, v in node.items() if k != "w"}
                    out["w_q"] = w_q
                    out["w_scale"] = scale
                    return out
                return quantize_linear_params(node)
            return {k: walk(v) for k, v in node.items()}
        return node

    out = dict(params)
    out["blocks"] = walk(params["blocks"])
    return out
