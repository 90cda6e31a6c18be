"""Decode-attention A/B at the WINDOWED streaming geometry (round-5).

The round-3 kernel sweeps ran at the FULL 32760-token window; the
windowed (infinite-streaming) config attends a two-interval
[1 sink frame | 12-frame recent window] live set of ~18.7k tokens with
frame-aligned 1560-token cache tiles (models/wan/dit.py:1330-1363).
This benches the EXACT production call — packed heads, stacked cache
with the layer prefetched in-kernel, sink_end + window_static — so the
16-fps floor table for the windowed loop rests on at-geometry numbers.

Usage: python scripts/bench_attn_windowed.py [tq ...]
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from self_forcing_tpu.ops.pallas_attention import decode_attention_fresh_pallas

LOG2E = 1.4426950408889634
B, N, D = 1, 12, 128
L_LAYERS = 30
FS = 1560                      # frame_seqlen at 480x832
LQ = 3 * FS                    # one 3-frame block of queries
BUF = 24 * FS                  # append buffer (24 frames)
SINK = 1 * FS                  # attention sinks
RECENT = 12 * FS - SINK - LQ   # keep_recent (window 12f)
CHAIN = 30
REPS = 5
SCALE = D ** -0.5


def mk(k, shape):
    # draw + row-normalize in bf16 (an f32 draw of the 6.9 GB stacked
    # cache peaks >14 GB of HBM with its normalization temps)
    @jax.jit
    def gen(k):
        x = jax.random.normal(k, shape, jnp.bfloat16)
        n = jnp.sqrt(jnp.mean(
            x.astype(jnp.float32) ** 2, axis=-1, keepdims=True))
        return (x / n.astype(jnp.bfloat16)).astype(jnp.bfloat16)
    return gen(k)


def main():
    tqs = [int(a) for a in sys.argv[1:]] or [512]  # 512 -> heuristic 936
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    q0 = mk(ks[0], (B, LQ, N * D))
    kc = mk(ks[1], (L_LAYERS, B * N, BUF, D))
    vc = mk(ks[2], (L_LAYERS, B * N, BUF, D))
    kn = mk(ks[3], (B, LQ, N * D))
    vn = mk(ks[4], (B, LQ, N * D))
    qv = (q0.astype(jnp.float32) * (SCALE * LOG2E)).astype(jnp.bfloat16)

    # steady-state interval bounds: sinks [0, SINK), recent window ends
    # at write_at (content filled to 18 frames in the 24f buffer, say)
    write_at = 18 * FS
    attn_lo = write_at - RECENT
    sink_hi = SINK

    # effective bf16-equivalent FLOPs per call (QK + PV over the live
    # two-interval window + the fresh block)
    live = SINK + RECENT + LQ
    flops = 2 * 2 * B * N * LQ * live * D

    for tq in tqs:
        def chain(q, kc, vc, kn, vn, tq=tq):
            # big operands are ARGUMENTS — closed over they become jit
            # constants (6.9 GB baked per variant; hangs the compile)
            def body(i, qq):
                out = decode_attention_fresh_pallas(
                    qq, kc, vc, kn, vn, attn_lo, write_at, scale=1.0,
                    softmax="free", quant="int8qk", layer_idx=i % L_LAYERS,
                    heads_packed=N, sink_end=sink_hi, tk_align=FS,
                    window_static=(SINK, RECENT), tq=tq)
                return qv + (out.astype(jnp.float32) * 1e-3).astype(
                    qq.dtype)
            qf = jax.lax.fori_loop(0, CHAIN, body, q)
            return jnp.sum(qf.astype(jnp.float32))

        try:
            f = jax.jit(chain)
            f(qv, kc, vc, kn, vn).block_until_ready()
        except Exception as e:
            print(f"tq={tq:5d}  FAILED: {str(e)[:100]}", flush=True)
            continue
        best = math.inf
        for _ in range(REPS):
            t0 = time.perf_counter()
            f(qv, kc, vc, kn, vn).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        ms = best / CHAIN * 1e3
        print(f"tq={tq:5d} {ms:7.3f} ms/call  "
              f"{flops / (best / CHAIN) / 1e12:6.1f} eff T/s  "
              f"(x150 calls = {ms * 150:.0f} ms/block attention)",
              flush=True)


if __name__ == "__main__":
    main()
