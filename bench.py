"""Benchmark: streaming chunk-wise AR generation throughput on one chip.

Measures the BASELINE.md primary metric — frames/sec/chip at Wan2.1-1.3B
geometry, 480x832, 4-step chunk-wise AR (7 blocks x (4 denoise + 1 cache
refresh) DiT forwards + streaming VAE decode of 81 frames), matching the
reference timing harness (pipeline/causal_inference.py profile=True and
demo.py per-block logs).  Weights are random (no checkpoints in this
environment) — throughput is weight-independent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extra}.
vs_baseline is against the 16 FPS real-time target (BASELINE.json).
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp


def main():
    from self_forcing_tpu.models.wan import dit, vae as vae_mod
    from self_forcing_tpu.models.wan.configs import WAN_1_3B, WanConfig
    from self_forcing_tpu.pipelines.causal_inference import (
        CausalInferencePipeline, generate_blocks)
    from self_forcing_tpu.config import Config

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    if on_tpu:
        cfg = dataclasses.replace(WAN_1_3B, num_frame_per_block=3)
        B, F, C, H, W = 1, 21, 16, 60, 104
        pixel_frames = 81
        vae_cfg = vae_mod.WAN_VAE
        dtype = jnp.bfloat16
        reps = 3
    else:  # CPU smoke mode (driver runs the real thing on TPU)
        cfg = WanConfig(dim=128, ffn_dim=256, num_heads=2, num_layers=2,
                        text_dim=64, freq_dim=32, num_frame_per_block=3)
        B, F, C, H, W = 1, 6, 16, 8, 8
        pixel_frames = 1 + (F - 1) * 4
        vae_cfg = vae_mod.VAE_TINY
        dtype = jnp.float32
        reps = 1

    key = jax.random.PRNGKey(0)
    params = dit.init_params(key, cfg, dtype=dtype)
    if on_tpu:
        vae_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            vae_mod.init_params(jax.random.fold_in(key, 1), vae_cfg))
        zc = vae_cfg.z_dim
    else:
        vae_params = vae_mod.init_params(jax.random.fold_in(key, 1), vae_cfg)
        zc = vae_cfg.z_dim

    args = Config({
        "denoising_step_list": [1000, 750, 500, 250],
        "warp_denoising_step": True,
        "timestep_shift": 8.0,
        "num_frame_per_block": cfg.num_frame_per_block,
        "independent_first_frame": False,
        "context_noise": 0,
    })
    pipe = CausalInferencePipeline(args, params, cfg)

    context = jax.random.normal(jax.random.fold_in(key, 2),
                                (B, 512, cfg.text_dim), dtype)
    noise = jax.random.normal(jax.random.fold_in(key, 3), (B, F, C, H, W),
                              dtype)
    # the DiT latent channel count vs tiny-VAE z mismatch on CPU: decode a
    # reshaped latent of the right channel count (throughput-only smoke).
    nb = cfg.num_frame_per_block

    ctx_kv = dit.precompute_context(params, cfg, context)
    fs = (H // 2) * (W // 2)

    def run_once(rng):
        """Streaming loop: per-block denoise, overlapped VAE decode."""
        cache = dit.init_kv_cache(cfg, B, fs, max(F, 21), dtype)
        t0 = time.perf_counter()
        ttfc = None
        dec_cache = None
        pixels = []
        start = jnp.int32(0)
        lat_for_vae = None
        first_decoded = False
        for b in range(F // nb):
            rng, k = jax.random.split(rng)
            blk, cache = generate_blocks(
                params, cfg, pipe.scheduler, pipe.rope, ctx_kv, cache,
                noise[:, b * nb:(b + 1) * nb], k, pipe.denoising_step_list,
                pipe.context_noise, 1, start)
            start = start + nb
            # streaming VAE decode of this block (async dispatch overlaps
            # with the next block's denoise)
            lat = blk.transpose(0, 1, 3, 4, 2)[..., :zc]
            if dec_cache is None:
                dec_cache = vae_mod.init_decoder_cache(
                    vae_params, vae_cfg, B, H, W, lat.dtype)
                px0, dec_cache = vae_mod.decode_frame(
                    vae_params, vae_cfg, lat[:, :1], dec_cache, first=True)
                pixels.append(px0)
                rest = lat[:, 1:]
            else:
                rest = lat
            for f in range(rest.shape[1]):
                px, dec_cache = vae_mod.decode_frame(
                    vae_params, vae_cfg, rest[:, f:f + 1], dec_cache,
                    first=False)
                pixels.append(px)
            if not first_decoded:
                jax.block_until_ready(pixels[-1])
                ttfc = time.perf_counter() - t0
                first_decoded = True
        jax.block_until_ready(pixels[-1])
        total = time.perf_counter() - t0
        return total, ttfc

    # warmup/compile
    rng = jax.random.PRNGKey(42)
    run_once(rng)

    times = []
    ttfcs = []
    for i in range(reps):
        total, ttfc = run_once(jax.random.fold_in(rng, i))
        times.append(total)
        ttfcs.append(ttfc)

    best = min(times)
    fps = pixel_frames / best
    result = {
        "metric": "frames_per_sec_per_chip_1.3b_480p" if on_tpu
        else "frames_per_sec_cpu_smoke",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 16.0, 3),
        "p50_ttfc_s": round(sorted(ttfcs)[len(ttfcs) // 2], 3),
        "total_s_81f": round(best, 3),
        "platform": platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
