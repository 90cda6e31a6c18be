"""Kernel A/B for the decode-fresh attention variants on the real TPU.

Full 32760-token live window at Wan-1.3B geometry (Lq=Lf=4680, cache
window 28080, 12x128 heads), 30 chained calls per jit (CLAUDE.md: never
trust per-op dispatch timings through the axon tunnel), best of 5.

Usage:  python scripts/bench_attn_kernels.py [variant ...]
        (default: online bounded free free_mul int8_tile int8_global)
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
Lq = 4680
S = 32768
HI = 28080
BN = B * N
SCALE = D ** -0.5
CHAIN = 30
REPS = 5


def mk(k, shape):
    x = jax.random.normal(k, shape, jnp.float32)
    x = x / jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True))
    return x.astype(jnp.bfloat16)


def main():
    variants = sys.argv[1:] or ["online", "bounded", "free",
                                "free_noclamp", "free_mul",
                                "int8_tile", "int8_global"]
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    q0 = mk(ks[0], (BN, Lq, D))
    kc = mk(ks[1], (BN, S, D))
    vc = mk(ks[2], (BN, S, D))
    kn = mk(ks[3], (BN, Lq, D))
    vn = mk(ks[4], (BN, Lq, D))

    def rowmax(t):
        tf = t.astype(jnp.float32)
        return float(jnp.sqrt(jnp.max(jnp.sum(tf * tf, axis=-1))))

    kmax = max(rowmax(kc), rowmax(kn))
    m0 = SCALE * rowmax(q0) * kmax
    print(f"C-S bound m0 = {m0:.2f} nats")

    def call(variant, q):
        if variant == "online":
            return decode_attention_fresh_pallas(q, kc, vc, kn, vn, 0, HI)
        if variant == "bounded":
            return decode_attention_fresh_pallas(q, kc, vc, kn, vn, 0, HI,
                                                 fixed_m0=m0)
        if variant == "free":
            # scale*log2e pre-folded into q; kernel sees scale == 1.0
            return decode_attention_fresh_pallas(q, kc, vc, kn, vn, 0, HI,
                                                 scale=1.0, softmax="free")
        if variant == "free_noclamp":
            return decode_attention_fresh_pallas(q, kc, vc, kn, vn, 0, HI,
                                                 scale=1.0,
                                                 softmax="free_noclamp")
        if variant == "free_mul":
            # scale pre-folded, log2e left as an in-kernel mul — isolates
            # the per-element multiply cost
            return decode_attention_fresh_pallas(q, kc, vc, kn, vn, 0, HI,
                                                 scale=LOG2E, softmax="free")
        if variant == "int8qk":
            # int8 QK / bf16 PV on the free path (no bound involved)
            return decode_attention_fresh_pallas(q, kc, vc, kn, vn, 0, HI,
                                                 scale=1.0, softmax="free",
                                                 quant="int8qk")
        if variant == "int8_tile":
            return decode_attention_fresh_pallas(q, kc, vc, kn, vn, 0, HI,
                                                 quant="int8", fixed_m0=m0)
        if variant == "int8_global":
            return decode_attention_fresh_pallas(q, kc, vc, kn, vn, 0, HI,
                                                 quant="int8", fixed_m0=m0,
                                                 int8_bound="global")
        raise SystemExit(f"unknown variant {variant}")

    def q_for(variant):
        if variant in ("free", "free_noclamp", "int8qk"):
            return (q0.astype(jnp.float32) * (SCALE * LOG2E)).astype(
                jnp.bfloat16)
        if variant == "free_mul":
            return (q0.astype(jnp.float32) * SCALE).astype(jnp.bfloat16)
        return q0

    # accuracy vs the online kernel (single call)
    ref = jax.jit(lambda q: call("online", q))(q0)
    reff = ref.astype(jnp.float32)
    for v in variants:
        if v == "online":
            continue
        out = jax.jit(lambda q, v=v: call(v, q))(q_for(v))
        err = jnp.mean(jnp.abs(out.astype(jnp.float32) - reff)) / (
            jnp.mean(jnp.abs(reff)) + 1e-12)
        print(f"{v:12s} rel err vs online: {float(err):.2e}")

    results = {}
    for v in variants:
        qv = q_for(v)

        def chain(q, v=v):
            def body(_, qq):
                out = call(v, qq)
                return (qv + (out.astype(jnp.float32) * 1e-3).astype(
                    qq.dtype))
            qf = jax.lax.fori_loop(0, CHAIN, body, q)
            return jnp.sum(qf.astype(jnp.float32))

        f = jax.jit(chain)
        f(qv).block_until_ready()  # compile + warm
        best = math.inf
        for _ in range(REPS):
            t0 = time.perf_counter()
            f(qv).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        ms = best / CHAIN * 1e3
        # effective bf16 FLOPs: 2 dots over (window + fresh) tokens
        flops = 2 * 2 * BN * Lq * (HI + Lq) * D
        results[v] = ms
        print(f"{v:12s} {ms:7.2f} ms/call   {flops / (best / CHAIN) / 1e12:6.1f} eff T/s")

    base = results.get("bounded")
    if base:
        for v, ms in results.items():
            print(f"{v:12s} vs bounded: {ms / base * 100:6.1f}%")


if __name__ == "__main__":
    main()
