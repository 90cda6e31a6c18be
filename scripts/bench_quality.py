"""End-to-end quality A/B of every speed toggle (VERDICT r3 item 2).

Same weights + same seed, full 81-frame 1.3B geometry on the real TPU:

  parity (bf16 free softmax)          <- reference output
  + int8qk attention                  (demo toggle 1)
  + W8A8 linears                      (demo toggle 2)
  windowed 12f+sink (demo config)     (infinite-streaming mode)

Reports per-config LATENT error vs parity (mean rel err + per-frame
PSNR over the latent value range) — the compounded effect through
30 layers x 34 forwards x the re-noise chain that the per-kernel tests
cannot see — plus PIXEL PSNR of the demo decode (TAEHV) against the
parity decode (full VAE), and the windowed-vs-global divergence at
>21 frames (sink-semantics pin).  The reference flags its own FP8/TAEHV
toggles as quality tradeoffs without numbers (README.md:63); this makes
ours measured.  Results -> stdout table + /tmp/quality_r4.json.
"""
import dataclasses
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from self_forcing_tpu.models.wan import dit, vae as vae_mod
from self_forcing_tpu.models.wan.configs import WAN_1_3B
from self_forcing_tpu.pipelines.causal_inference import (
    CausalInferencePipeline, denoise_block, refresh_block)
from self_forcing_tpu.config import Config
from self_forcing_tpu.ops.quant import quantize_dit_params


CKPT_DIR = "/tmp/quality_r4_ckpt"


def cached(name, fn):
    """Per-phase checkpoint: the axon tunnel's up-windows are shorter
    than the whole script, so each rollout persists to disk and a retry
    resumes where the previous attempt died.  ``rm -r /tmp/quality_r4_ckpt``
    after kernel/numerics changes — stale phases would silently mix."""
    path = os.path.join(CKPT_DIR, name + ".npy")
    if os.path.exists(path):
        print(f"[quality] {name}: cached", flush=True)
        return np.load(path)
    out = fn()
    os.makedirs(CKPT_DIR, exist_ok=True)
    np.save(path, out)
    return out


def gen_latents(params, cfg, pipe, ctx_kv, noise, nb, fs, windowed=False):
    """Deterministic latent rollout (fixed per-block rng streams)."""
    B, F = noise.shape[:2]
    cache = dit.init_kv_cache(cfg, B, fs, max(F, 21), jnp.bfloat16)
    start = jnp.int32(0)
    outs = []
    content = 0
    if windowed:
        buf_tok, post = dit.windowed_compaction_schedule(cfg, fs, nb * fs)
    rng = jax.random.PRNGKey(42)
    num_blocks = F // nb
    for b in range(num_blocks):
        rng, k = jax.random.split(rng)
        if windowed:
            if content + nb * fs > buf_tok:
                cache = dit.compact_cache(cfg, cache, nb * fs)
                content = post
            content += nb * fs
        hint = b * nb * fs if not windowed else None
        blk, cache = denoise_block(
            params, cfg, pipe.scheduler, pipe.rope, ctx_kv, cache,
            noise[:, b * nb:(b + 1) * nb], k, pipe.denoising_step_list,
            start, static_kv_hi=hint)
        outs.append(blk)
        if b < num_blocks - 1:
            rng, k2 = jax.random.split(rng)
            cache = refresh_block(params=params, cfg=cfg, rope=pipe.rope,
                                  ctx_kv=ctx_kv, cache=cache, x0=blk,
                                  rng=k2, context_noise=pipe.context_noise,
                                  start_frame=start, static_kv_hi=hint)
        start = start + nb
    return np.asarray(jnp.concatenate(outs, axis=1).astype(jnp.float32))


def latent_stats(ref, x):
    d = x - ref
    rel = float(np.abs(d).mean() / np.abs(ref).mean())
    rng = float(ref.max() - ref.min())
    # per-frame PSNR over the latent value range
    mse_f = (d ** 2).mean(axis=(0, 2, 3, 4))
    psnr_f = 10 * np.log10(rng ** 2 / np.maximum(mse_f, 1e-12))
    return rel, float(psnr_f.mean()), float(psnr_f.min())


def pixel_psnr(a, b):
    d = a.astype(np.float32) - b.astype(np.float32)
    mse = (d ** 2).mean(axis=(1, 2, 3))   # per-frame over [0,1] range
    psnr = 10 * np.log10(1.0 / np.maximum(mse, 1e-12))
    return float(psnr.mean()), float(psnr.min())


def main():
    cfg = dataclasses.replace(WAN_1_3B, num_frame_per_block=3)
    B, F, C, H, W = 1, 21, 16, 60, 104
    nb, fs = 3, (H // 2) * (W // 2)
    key = jax.random.PRNGKey(0)
    params = dit.init_params(key, cfg, dtype=jnp.bfloat16)
    # zero-init head (reference causal_model.py:1128) makes outputs
    # degenerate with random weights; randomize for meaningful errors
    params["head"]["head"]["w"] = (0.02 * jax.random.normal(
        jax.random.fold_in(key, 5),
        params["head"]["head"]["w"].shape)).astype(jnp.bfloat16)
    args = Config({"denoising_step_list": [1000, 750, 500, 250],
                   "warp_denoising_step": True, "timestep_shift": 8.0,
                   "num_frame_per_block": nb,
                   "independent_first_frame": False, "context_noise": 0})
    pipe = CausalInferencePipeline(args, params, cfg)
    context = jax.random.normal(jax.random.fold_in(key, 2),
                                (B, 512, cfg.text_dim), jnp.bfloat16)
    noise = jax.random.normal(jax.random.fold_in(key, 3),
                              (B, F, C, H, W), jnp.bfloat16)
    ctx_kv = dit.precompute_context(params, cfg, context)

    results = {}
    t0 = time.time()
    print("[quality] parity rollout...", flush=True)
    lat_parity = cached("parity", lambda: gen_latents(
        params, cfg, pipe, ctx_kv, noise, nb, fs))

    print(f"[quality] int8qk attention... ({time.time()-t0:.0f}s)",
          flush=True)
    cfg_a = dataclasses.replace(cfg, attn_quant="int8qk")
    lat_a = cached("int8qk", lambda: gen_latents(
        params, cfg_a, pipe,
        dit.precompute_context(params, cfg_a, context), noise, nb, fs))
    results["int8qk_attn"] = latent_stats(lat_parity, lat_a)

    print(f"[quality] int8qk + W8A8 linears... ({time.time()-t0:.0f}s)",
          flush=True)
    qp = quantize_dit_params(params, mode="w8a8")
    ctx_kv_q = dit.precompute_context(qp, cfg_a, context)
    lat_q = cached("int8qk_w8a8", lambda: gen_latents(
        qp, cfg_a, pipe, ctx_kv_q, noise, nb, fs))
    results["int8qk_w8a8"] = latent_stats(lat_parity, lat_q)

    print(f"[quality] windowed 12f+sink1 (demo cfg)... "
          f"({time.time()-t0:.0f}s)", flush=True)
    cfg_w = dataclasses.replace(cfg_a, local_attn_size=12, sink_size=1,
                                windowed_buffer_frames=24)
    lat_w = cached("windowed", lambda: gen_latents(
        qp, cfg_w, pipe, dit.precompute_context(qp, cfg_w, context),
        noise, nb, fs, windowed=True))
    # windowed truncates attention beyond the 12-frame window: frames
    # within the first window match the global config; later frames pin
    # the sink semantics (legitimate divergence, reported not asserted)
    results["windowed_vs_global_demo"] = latent_stats(lat_q, lat_w)
    results["windowed_first12f_vs_global"] = latent_stats(
        lat_q[:, :12], lat_w[:, :12])

    print(f"[quality] pixel decode (full VAE vs TAEHV)... "
          f"({time.time()-t0:.0f}s)", flush=True)
    from self_forcing_tpu.models import taehv as taehv_mod
    vae_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        vae_mod.init_params(jax.random.fold_in(key, 1), vae_mod.WAN_VAE))
    tae = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                       taehv_mod.init_decoder_params(
                           jax.random.fold_in(key, 7)))

    def vae_decode(lat):
        z = jnp.asarray(lat).transpose(0, 1, 3, 4, 2).astype(jnp.bfloat16)
        px = vae_mod.decode(vae_params, vae_mod.WAN_VAE, z)
        return np.asarray(jnp.clip(px * 0.5 + 0.5, 0, 1)
                          .astype(jnp.float32))

    def tae_decode(lat):
        # chunked streaming decode (3-latent blocks, the demo path):
        # the whole-video eager decode materializes full-81-frame
        # intermediates per op and OOMs next to the other buffers
        dec = jax.jit(taehv_mod.decode_video, static_argnames=("trim",))
        streamer = taehv_mod.TAEHVStreamer(tae, overlap=3, decode_fn=dec)
        z = jnp.asarray(lat).astype(jnp.bfloat16)
        outs = [np.asarray(streamer.decode_chunk(z[:, i:i + 3]))
                for i in range(0, z.shape[1], 3)]
        px = np.concatenate(outs, axis=1)[0].astype(np.float32)
        return np.clip(px, 0, 1)[None]

    px_parity = cached("px_parity", lambda: vae_decode(lat_parity))[0]
    px_demo_vae = cached("px_demo_vae", lambda: vae_decode(lat_q))[0]
    # free the full VAE before the TAEHV decode (HBM headroom)
    del vae_params
    import gc
    gc.collect()
    px_demo_tae = cached("px_demo_tae", lambda: tae_decode(lat_q))[0]
    n = min(px_parity.shape[0], px_demo_tae.shape[0])
    # NOTE on random weights: the TAEHV decoder is a DIFFERENT random
    # network than the VAE here, so tae-vs-vae pixel PSNR is meaningless
    # without real checkpoints; report the DiT-stack pixel effect
    # (same decoder both sides) which is weight-representative.
    results["pixel_dit_stack_psnr"] = pixel_psnr(px_parity[:n],
                                                 px_demo_vae[:n])
    results["pixel_decoder_mismatch_note"] = (
        "TAEHV uses random init != VAE random init; decoder-vs-decoder "
        "PSNR requires real checkpoints (none in this env)")

    print("\nconfig                         rel_err   psnr_mean  psnr_min")
    for k, v in results.items():
        if isinstance(v, tuple) and len(v) == 3:
            print(f"{k:30s} {v[0]:8.4f} {v[1]:9.2f} {v[2]:9.2f}")
        elif isinstance(v, tuple):
            print(f"{k:30s}          {v[0]:9.2f} {v[1]:9.2f}")
    with open("/tmp/quality_r4.json", "w") as f:
        json.dump({k: v for k, v in results.items()}, f, indent=1,
                  default=str)
    print(f"[quality] done in {time.time()-t0:.0f}s; "
          "wrote /tmp/quality_r4.json")


if __name__ == "__main__":
    main()
