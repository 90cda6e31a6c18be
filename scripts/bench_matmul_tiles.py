"""A/B the W8A8 square-matmul tiles at the DiT shapes on the real TPU.

Validates the round-3 tn cap change (896 -> 1536 on the shallow K=1536
qkv/o shapes; PERF.md round-2 sweep measured +4-6%).  300 chained
calls/jit (the ~35 ms tunnel dispatch floor must be << kernel time),
best of 5.
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from self_forcing_tpu.ops import pallas_matmul as pm

M = 4680
CHAIN = 300
REPS = 5
SHAPES = [(1536, 4608, "fused qkv"), (1536, 1536, "o/cross proj")]


def main():
    key = jax.random.PRNGKey(0)
    for K, N, name in SHAPES:
        kx, kw = jax.random.split(jax.random.fold_in(key, N), 2)
        x = (jax.random.normal(kx, (M, K), jnp.float32)).astype(jnp.bfloat16)
        w = jax.random.randint(kw, (K, N), -127, 128, jnp.int8)
        ws = jnp.full((N,), 1e-2, jnp.float32)

        for cap_label, tn_cap in [("tn<=896 (r2 ship)", 896),
                                  ("tn<=1536 (r3)", 1536)]:
            def chain(xx, tn_cap=tn_cap):
                def body(_, acc):
                    q2 = pm.quantize_rows_pallas(acc)
                    y = pm.w8a8_matmul(q2[0], q2[1], w, ws, tn_cap=tn_cap)
                    # feed back at constant magnitude; slice keeps K
                    return (xx + 1e-3 * y[:, :K].astype(jnp.bfloat16))
                out = jax.lax.fori_loop(0, CHAIN, body, xx)
                return jnp.sum(out.astype(jnp.float32))

            f = jax.jit(chain)
            f(x).block_until_ready()
            best = math.inf
            for _ in range(REPS):
                t0 = time.perf_counter()
                f(x).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            ms = best / CHAIN * 1e3
            tops = 2 * M * K * N / (best / CHAIN) / 1e12
            print(f"{name:14s} {cap_label:18s} {ms:7.3f} ms  {tops:6.1f} T/s")


if __name__ == "__main__":
    main()
