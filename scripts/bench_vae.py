"""81-frame streaming VAE decode bench on the real TPU (parity config's
second phase; PERF.md: 5.0-5.2 s baseline, 741 ms/block steady state =
326 ms convs near roofline + 415 ms XLA glue).

Mirrors bench.py's decode loop exactly: frame-0 program + rest-of-block,
then 6 more 3-latent blocks, carried cache, bf16.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp

from self_forcing_tpu.models.wan import vae as vae_mod

B, H, W = 1, 60, 104
REPS = 3


def _conv3d_padfuse(p, x, stride=(1, 1, 1), spatial_pad=(0, 0)):
    """Variant: explicit jnp.pad + VALID conv — the pad then becomes a
    fusible output of the preceding norm/silu elementwise chain instead
    of XLA's internal conv-input pad copy (the 56 ms/block 'pad'
    category in the round-1 trace)."""
    if spatial_pad != (0, 0):
        sh, sw = spatial_pad
        x = jnp.pad(x, ((0, 0), (0, 0), (sh, sh), (sw, sw), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride,
        padding=((0, 0), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + p["b"]


def main():
    variants = sys.argv[1:] or ["base"]
    unroll = 1
    for v in variants:
        if v == "padfuse":
            vae_mod._conv3d = _conv3d_padfuse
        elif v.startswith("unroll"):
            unroll = True
        elif v != "base":
            raise SystemExit(f"unknown variant {v}")
    print("variants:", variants)

    cfg = vae_mod.WAN_VAE
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          vae_mod.init_params(key, cfg))
    lat = jax.random.normal(jax.random.fold_in(key, 1),
                            (B, 21, H, W, cfg.z_dim), jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def frame0(z, cache):
        return vae_mod.decode_frame(params, cfg, z, cache, first=True)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def rest(z, cache):
        return vae_mod.decode_block(params, cfg, z, cache, first=False,
                                    unroll=unroll)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def block(z, cache):
        return vae_mod.decode_block(params, cfg, z, cache, first=False,
                                    unroll=unroll)

    def run():
        cache = vae_mod.init_decoder_cache(params, cfg, B, H, W,
                                           jnp.bfloat16)
        t0 = time.perf_counter()
        px0, cache = frame0(lat[:, :1], cache)
        float(px0[0, 0, 0, 0, 0])
        t_first = time.perf_counter() - t0
        px, cache = rest(lat[:, 1:3], cache)
        for b in range(1, 7):
            px, cache = block(lat[:, 3 * b:3 * b + 3], cache)
        float(px[0, -1, -1, -1, -1])
        return time.perf_counter() - t0, t_first

    run()  # compile
    best, bf = min(run() for _ in range(REPS)), None
    total, first = best
    print(f"81f streaming decode: {total:.3f} s  (first frame {first:.3f} s)"
          f"  -> {81 / total:.1f} px-frames/s")


if __name__ == "__main__":
    main()
