"""Pallas TPU W8A8 matmul with fused dequantization epilogue.

The reference's quantized-linear speed toggle (torchao
Float8DynamicActivationFloat8WeightConfig, demo.py:277-283) maps on TPU
to int8 x int8 -> int32 on the MXU's native int8 path (v5e: 394 TOP/s
peak vs 197 bf16).  A plain XLA ``dot_general(int8, int8)`` reaches
~205 TOP/s at DiT shapes but loses most of the win to the unfused
epilogue: the int32 accumulator round-trips to HBM ([4680, 8960] int32 =
167 MB for the big FFN) before the `* s_x * w_scale` dequant.  This
kernel keeps the int32 accumulator in VMEM and writes bf16 directly:

    out[tm, tn] = (acc_int32 * s_x[tm, 1] * w_scale[1, tn] + b).astype(bf16)

Activation quantization (per-token max/round, ops/quant.py) stays in XLA
where it fuses with the preceding layernorm/gelu.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, sx_ref, w_ref, ws_ref, b_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _():
        y = acc_ref[...].astype(jnp.float32)
        y = y * sx_ref[...] * ws_ref[...] + b_ref[...]
        o_ref[...] = y.astype(o_ref.dtype)


def _pick_tile(dim: int, mult: int, cap: int) -> int | None:
    """Largest divisor of ``dim`` that is a multiple of ``mult``, <= cap."""
    best = None
    for t in range(mult, min(dim, cap) + 1, mult):
        if dim % t == 0:
            best = t
    return best


def w8a8_matmul(x_q: jax.Array, s_x: jax.Array, w_q: jax.Array,
                w_scale: jax.Array, bias: jax.Array | None = None,
                out_dtype=jnp.bfloat16, interpret: bool = False):
    """(x_q int8 [M,K], s_x f32 [M,1]) @ (w_q int8 [K,N], w_scale f32 [N])
    + bias -> [M,N] out_dtype.  Returns None if no legal tiling exists
    (caller falls back to the XLA path)."""
    M, K = x_q.shape
    Kw, N = w_q.shape
    assert K == Kw and s_x.shape == (M, 1) and w_scale.shape == (N,)
    # On-chip sweep (v5e): tm~936/tn<=896/tk<=1536 is best at the DiT
    # shapes — 205 T/s on the 8960-wide/deep FFN matmuls, ~125 on the
    # K=N=1536 square ones.
    tm = _pick_tile(M, 8, 1024)
    tn = _pick_tile(N, 128, 896)
    if tm is None or tn is None or K % 128:
        return None
    # VMEM: double-buffered x/w tiles + int32 acc + out tile, under ~12MB
    budget = int(10e6) - 4 * tm * tn - 2 * tm * tn
    tk_cap = max(128, budget // (2 * (tm + tn)))
    tk = _pick_tile(K, 128, min(K, tk_cap, 1536))
    if tk is None:
        return None
    nk = K // tk
    b = (bias if bias is not None
         else jnp.zeros((N,), jnp.float32)).astype(jnp.float32).reshape(1, N)
    ws = w_scale.astype(jnp.float32).reshape(1, N)
    return pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=(M // tm, N // tn, nk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k)),
            pl.BlockSpec((tm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x_q, s_x.astype(jnp.float32), w_q, ws, b)
