"""Tile sweep for the decode-fresh kernel (free softmax) on the real TPU.

The round-3 A/B showed the kernel is MXU-pipeline-bound (145 eff T/s =
74% of bf16 peak; the softmax offset chain is free).  This sweeps
(tq, tk) for pipeline efficiency at the full 32760-token window.
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
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    q0 = mk(ks[0], (BN, Lq, D))
    kc = mk(ks[1], (BN, S, D))
    vc = mk(ks[2], (BN, S, D))
    kn = mk(ks[3], (BN, Lq, D))
    vn = mk(ks[4], (BN, Lq, D))
    qv = (q0.astype(jnp.float32) * (SCALE * LOG2E)).astype(jnp.bfloat16)

    tiles = [(512, 2048), (512, 1024), (256, 2048), (1024, 2048),
             (512, 3072), (256, 4096), (512, 4096), (1024, 1024)]
    if len(sys.argv) > 1:
        tiles = [tuple(map(int, a.split("x"))) for a in sys.argv[1:]]

    flops = 2 * 2 * BN * Lq * (HI + Lq) * D
    for tq, tk in tiles:
        def chain(q, tq=tq, tk=tk):
            def body(_, qq):
                out = decode_attention_fresh_pallas(
                    qq, kc, vc, kn, vn, 0, HI, scale=1.0, softmax="free",
                    tq=tq, tk=tk)
                return qv + (out.astype(jnp.float32) * 1e-3).astype(qq.dtype)
            return jnp.sum(jax.lax.fori_loop(0, CHAIN, body, q).astype(
                jnp.float32))

        try:
            f = jax.jit(chain)
            f(qv).block_until_ready()
        except Exception as e:
            print(f"tq={tq:5d} tk={tk:5d}  FAILED: {str(e)[:80]}")
            continue
        best = math.inf
        for _ in range(REPS):
            t0 = time.perf_counter()
            f(qv).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        ms = best / CHAIN * 1e3
        print(f"tq={tq:5d} tk={tk:5d}  {ms:7.2f} ms/call  "
              f"{flops / (best / CHAIN) / 1e12:6.1f} eff T/s")


if __name__ == "__main__":
    main()
