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
        y = y * sx_ref[:, 0:1] * ws_ref[...] + b_ref[...]
        o_ref[...] = y.astype(o_ref.dtype)


def _quant_rows(xt: "jax.Array", floor: float = 1e-8):
    """Per-token absmax int8 quantization (one semantics for every
    in-kernel use; mirrors ops/quant.quantize_activations).  Returns
    (x_q int8, s f32 [rows, 1])."""
    s = jnp.maximum(jnp.max(jnp.abs(xt), axis=1, keepdims=True),
                    floor) / 127.0
    return jnp.clip(jnp.round(xt / s), -127, 127).astype(jnp.int8), s


def _kernel_bf16x(x_ref, w_ref, ws_ref, b_ref, o_ref):
    """W8A8 matmul taking RAW bf16 activations: per-token scale and int8
    cast happen in VMEM on the resident x tile (requires K = one tile).
    Kills the whole XLA-side quantization chain — the absmax row-reduce
    over [4680, 1536] alone costs 1.35 ms (60x its bandwidth cost; XLA
    minor-dim reductions to a [M] vector run at ~10 GB/s), plus the
    round/clamp/int8-pack pass.  The re-quantization per n-step is VPU
    work on a resident tile (~30 us) and Mosaic elides the x re-fetch
    (same block index across the inner n grid dim)."""
    x_q, s = _quant_rows(x_ref[...].astype(jnp.float32))
    acc = jax.lax.dot_general(
        x_q, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s * ws_ref[...] + b_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def _ffn1_kernel_bf16x(x_ref, w_ref, ws_ref, b_ref, o_ref, so_ref):
    """_ffn1_kernel with in-kernel activation quantization (K = one
    tile): bf16 x in, gelu + group-quantized int8 hidden out."""
    x_q, s = _quant_rows(x_ref[...].astype(jnp.float32))
    acc = jax.lax.dot_general(
        x_q, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s * ws_ref[...] + b_ref[...]
    g = jax.nn.gelu(y, approximate=True)
    # gelu output floor 1e-6: whole rows can be ~0 after gating
    g_q, sg = _quant_rows(g, floor=1e-6)
    o_ref[...] = g_q
    so_ref[...] = jnp.broadcast_to(sg, so_ref.shape)


def _ffn1_kernel(x_ref, sx_ref, w_ref, ws_ref, b_ref, o_ref, so_ref,
                 acc_ref, *, nk):
    """fc1 with the whole between-matmul chain fused into the epilogue:
    dequant -> +bias -> gelu(tanh) -> group-wise int8 quant.  The XLA
    version of this chain (absmax reduce + round/clamp/pack over the
    [4680, 8960] gelu output) costs ~7.4 ms/forward at 1.3B geometry —
    trace-measured, ~20x its bandwidth cost — because int8 packing and
    full-row reductions fuse poorly.  Group width == this kernel's tn ==
    fc2's tk, so each fc2 k-step sees exactly one scale column."""
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
        g = jax.nn.gelu(y, approximate=True)
        g_q, sg = _quant_rows(g, floor=1e-6)
        o_ref[...] = g_q
        # scale broadcast across a 128-lane block (Mosaic requires the
        # last block dim be 128-divisible or the full array dim)
        so_ref[...] = jnp.broadcast_to(sg, so_ref.shape)


def _ffn2_kernel(x_ref, sg_ref, w_ref, ws_ref, b_ref, o_ref, acc_ref, *,
                 nk):
    """fc2 consuming group-quantized activations: the int8 x int8 tile
    product is dequantized per k-step by that step's group scale column
    and accumulated in f32 (group scales differ across k, so the int32
    accumulator cannot be kept across steps)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_ref[...] += p.astype(jnp.float32) * sg_ref[:, 0:1]

    @pl.when(k == nk - 1)
    def _():
        y = acc_ref[...] * ws_ref[...] + b_ref[...]
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
                out_dtype=jnp.bfloat16, interpret: bool = False,
                tn_cap: int = 896):
    """(x_q int8 [M,K], s_x f32 [M,1]) @ (w_q int8 [K,N], w_scale f32 [N])
    + bias -> [M,N] out_dtype.  Returns None if no legal tiling exists
    (caller falls back to the XLA path).  ``tn_cap`` exists for tile
    A/Bs (scripts/bench_matmul_tiles.py)."""
    M, K = x_q.shape
    Kw, N = w_q.shape
    # s_x: per-token scales, [M, 1] or lane-broadcast [M, 128]
    assert K == Kw and s_x.shape[0] == M and w_scale.shape == (N,)
    # On-chip sweep (v5e): tm~936/tn<=896/tk<=1536 is best at the DiT
    # shapes — 205 T/s on the 8960-wide/deep FFN matmuls, 225 on the
    # fused qkv, ~130 on K=N=1536.  A square tn=1536 re-try (round 3,
    # scripts/bench_matmul_tiles.py) measured 5-14% SLOWER in the chained
    # quantize+matmul harness: the big out tile starves the k-tile VMEM
    # budget down to tk=256, and six accumulator passes cost more than
    # the saved epilogue — tn<=896 with single-pass tk=1536 wins.
    tm = _pick_tile(M, 8, 1024)
    tn = _pick_tile(N, 128, tn_cap)
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
            pl.BlockSpec((tm, s_x.shape[1]), lambda i, j, k: (i, 0)),
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


def _quantize_rows_kernel(x_ref, o_ref, s_ref):
    x_q, s = _quant_rows(x_ref[...].astype(jnp.float32))
    o_ref[...] = x_q
    s_ref[...] = jnp.broadcast_to(s, s_ref.shape)


def quantize_rows_pallas(x: jax.Array, interpret: bool = False):
    """Per-token symmetric int8 quantization as ONE Pallas pass:
    (x bf16 [M, K]) -> (x_q int8 [M, K], scale f32 [M, 128]-broadcast).

    Same semantics as ops.quant.quantize_activations, but the XLA chain
    costs ~2.3 ms at [4680, 1536] (the absmax row-reduce to a [M] vector
    alone is 1.35 ms, ~60x its bandwidth cost) where this kernel is a
    single streaming pass.  Returns None when no legal tiling exists."""
    M, K = x.shape
    tm = _pick_tile(M, 8, 2048)
    if tm is None or K % 128 or K > 4096:
        return None
    # VMEM budget: bf16 in (2K) + int8 out (K) + f32 scale (512) bytes per
    # row — shrink tm until under ~14MB, else decline (the documented
    # 'None when no legal tiling exists' contract; tm<=2048/K<=4096 alone
    # admits 20MB tiles past the 16MB scoped-VMEM hard limit).  Budget
    # calibrated to keep the measured-good production tile (tm=1560,
    # K=1536 -> 8MB) untouched.
    while tm is not None and tm * (3 * K + 512) > 14 * 2 ** 20:
        tm = _pick_tile(M, 8, tm - 1) if tm > 8 else None
    if tm is None:
        return None
    return pl.pallas_call(
        _quantize_rows_kernel,
        grid=(M // tm,),
        in_specs=[pl.BlockSpec((tm, K), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((tm, K), lambda i: (i, 0)),
            pl.BlockSpec((tm, 128), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, K), jnp.int8),
            jax.ShapeDtypeStruct((M, 128), jnp.float32),
        ],
        interpret=interpret,
    )(x)


def w8a8_matmul_bf16x(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
                      bias: jax.Array | None = None,
                      out_dtype=jnp.bfloat16, interpret: bool = False):
    """W8A8 matmul from RAW bf16/f32 activations (in-kernel per-token
    quantization; see _kernel_bf16x).  Requires K to fit one tile
    (<= 1536) — covers every square DiT projection.  Returns None when
    no legal tiling exists (caller falls back)."""
    M, K = x.shape
    Kw, N = w_q.shape
    assert K == Kw and w_scale.shape == (N,)
    tm = _pick_tile(M, 8, 1024)
    tn = _pick_tile(N, 128, 896)
    if tm is None or tn is None or K % 128 or K > 1536:
        return None
    b = (bias if bias is not None
         else jnp.zeros((N,), jnp.float32)).astype(jnp.float32).reshape(1, N)
    ws = w_scale.astype(jnp.float32).reshape(1, N)
    return pl.pallas_call(
        _kernel_bf16x,
        grid=(M // tm, N // tn),
        in_specs=[
            pl.BlockSpec((tm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, tn), lambda i, j: (0, j)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, w_q, ws, b)


def w8a8_ffn(x_q: jax.Array, s_x: jax.Array,
             w1_q: jax.Array, w1_scale: jax.Array, b1: jax.Array | None,
             w2_q: jax.Array, w2_scale: jax.Array, b2: jax.Array | None,
             out_dtype=jnp.bfloat16, interpret: bool = False):
    """Fused W8A8 FFN: fc1 -> gelu -> group-quant -> fc2, all epilogues
    in VMEM.  The int8 hidden activations (plus one f32 scale per
    (token, group)) are the ONLY intermediate that touches HBM — the XLA
    chain writes the bf16 gelu output, re-reads it for the absmax
    reduce, and re-reads it again to quantize (~7.4 ms/forward at 1.3B).
    Group width = fc1's output tile = fc2's k tile.

    With ``s_x=None`` and bf16/f32 ``x_q``, fc1 quantizes its input
    in-kernel (per-token scale on the resident tile; requires K <= one
    tile) — no XLA-side quantization pass at all.

    Returns None if no legal tiling exists (caller falls back)."""
    M, K = x_q.shape
    _, H = w1_q.shape          # hidden (ffn) width
    _, N = w2_q.shape
    tm = _pick_tile(M, 8, 1024)
    tg = _pick_tile(H, 128, 896)           # group width (fc1 tn = fc2 tk)
    tn2 = _pick_tile(N, 128, 896)
    tk1 = _pick_tile(K, 128, 1536)
    raw_x = s_x is None
    if tm is None or tg is None or tn2 is None or tk1 is None \
            or (raw_x and tk1 != K):
        return None
    nk1 = K // tk1
    ng = H // tg

    f32row = lambda a, n: (a if a is not None
                           else jnp.zeros((n,), jnp.float32)
                           ).astype(jnp.float32).reshape(1, n)
    if raw_x:
        h_q, h_s = pl.pallas_call(
            _ffn1_kernel_bf16x,
            grid=(M // tm, ng),
            in_specs=[
                pl.BlockSpec((tm, K), lambda i, j: (i, 0)),
                pl.BlockSpec((K, tg), lambda i, j: (0, j)),
                pl.BlockSpec((1, tg), lambda i, j: (0, j)),
                pl.BlockSpec((1, tg), lambda i, j: (0, j)),
            ],
            out_specs=[
                pl.BlockSpec((tm, tg), lambda i, j: (i, j)),
                pl.BlockSpec((tm, 128), lambda i, j: (i, j)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((M, H), jnp.int8),
                jax.ShapeDtypeStruct((M, ng * 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(x_q, w1_q, f32row(w1_scale, H), f32row(b1, H))
    else:
        h_q, h_s = pl.pallas_call(
            functools.partial(_ffn1_kernel, nk=nk1),
            grid=(M // tm, ng, nk1),
            in_specs=[
                pl.BlockSpec((tm, tk1), lambda i, j, k: (i, k)),
                pl.BlockSpec((tm, 1), lambda i, j, k: (i, 0)),
                pl.BlockSpec((tk1, tg), lambda i, j, k: (k, j)),
                pl.BlockSpec((1, tg), lambda i, j, k: (0, j)),
                pl.BlockSpec((1, tg), lambda i, j, k: (0, j)),
            ],
            out_specs=[
                pl.BlockSpec((tm, tg), lambda i, j, k: (i, j)),
                pl.BlockSpec((tm, 128), lambda i, j, k: (i, j)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((M, H), jnp.int8),
                jax.ShapeDtypeStruct((M, ng * 128), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((tm, tg), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(x_q, s_x.astype(jnp.float32),
          w1_q, f32row(w1_scale, H), f32row(b1, H))

    return pl.pallas_call(
        functools.partial(_ffn2_kernel, nk=ng),
        grid=(M // tm, N // tn2, ng),
        in_specs=[
            pl.BlockSpec((tm, tg), lambda i, j, k: (i, k)),
            pl.BlockSpec((tm, 128), lambda i, j, k: (i, k)),
            pl.BlockSpec((tg, tn2), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, tn2), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, tn2), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn2), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(h_q, h_s, w2_q, f32row(w2_scale, N), f32row(b2, N))
