"""Windowed (rolling KV, attention sinks) streaming throughput on TPU.

The infinite-streaming configuration: local_attn_size caps the window so
per-block cost stops growing with video length — the reference's
long-video story (causal_model.py:203-229).  Round 3 re-architected this
path onto the read-only-cache fast path (one all-layer roll outside the
scan, fused write); this bench is both its real-TPU smoke test and its
throughput number.

Measures steady-state blocks (the window is full, every block pays one
eviction roll) over 14 blocks = 42 latent frames, demo-speed config.
"""
import dataclasses
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WAN_1_3B
from self_forcing_tpu.pipelines.causal_inference import (
    CausalInferencePipeline, denoise_block, refresh_block)
from self_forcing_tpu.config import Config
from self_forcing_tpu.ops.quant import quantize_dit_params


def main():
    # 12-frame window with a 1-frame sink, 3-frame blocks; 24-frame
    # buffer = append-only blocks with one contiguous compaction every
    # 5 blocks instead of a full-cache gather roll per block (round 4)
    import os as _os
    buf = int(_os.environ.get("BUF_FRAMES", "24"))
    cfg = dataclasses.replace(WAN_1_3B, num_frame_per_block=3,
                              local_attn_size=12, sink_size=1,
                              windowed_buffer_frames=buf,
                              attn_quant="int8qk")
    B, C, H, W = 1, 16, 60, 104
    NBLOCKS = int(_os.environ.get("NBLOCKS", "14"))
    F = NBLOCKS * 3
    key = jax.random.PRNGKey(0)
    params = quantize_dit_params(
        dit.init_params(key, cfg, dtype=jnp.bfloat16), mode="w8a8")
    args = Config({"denoising_step_list": [1000, 750, 500, 250],
                   "warp_denoising_step": True, "timestep_shift": 8.0,
                   "num_frame_per_block": 3,
                   "independent_first_frame": False, "context_noise": 0})
    pipe = CausalInferencePipeline(args, params, cfg)
    context = jax.random.normal(jax.random.fold_in(key, 2),
                                (B, 512, cfg.text_dim), jnp.bfloat16)
    noise = jax.random.normal(jax.random.fold_in(key, 3),
                              (B, F, C, H, W), jnp.bfloat16)
    ctx_kv = dit.precompute_context(params, cfg, context)
    fs = (H // 2) * (W // 2)
    nb = 3

    buf_tok, post = dit.windowed_compaction_schedule(cfg, fs, nb * fs)

    # WITH_TAEHV=1: overlapped per-block TAEHV decode in the loop — the
    # serving-path e2e number (decode is device work, so it serializes
    # with the DiT programs; the host only syncs on the final pixel)
    with_taehv = os.environ.get("WITH_TAEHV", "0") == "1"
    if with_taehv:
        from self_forcing_tpu.models import taehv as taehv_mod
        tae = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                           taehv_mod.init_decoder_params(
                               jax.random.fold_in(key, 7)))
        if os.environ.get("TAEHV_INT8", "0") == "1":  # opt-in A/B
            tae = taehv_mod.quantize_decoder_params(tae)
        tae_decode = jax.jit(taehv_mod.decode_video,
                             static_argnames=("trim",))

    def run():
        cache = dit.init_kv_cache(cfg, B, fs, F, jnp.bfloat16)
        rng = jax.random.PRNGKey(42)
        start = jnp.int32(0)
        t_steady = None
        blk = None
        px = None
        content = 0
        streamer = (taehv_mod.TAEHVStreamer(tae, overlap=3,
                                            decode_fn=tae_decode)
                    if with_taehv else None)
        for b in range(NBLOCKS):
            rng, k = jax.random.split(rng)
            # window is full from block 4 on: time the steady state
            if b == 4:
                float(jnp.ravel(blk)[0])
                t_steady = time.perf_counter()
            # host-scheduled compaction (pipelines/causal_inference.py
            # stream() does the same bookkeeping)
            if content + nb * fs > buf_tok:
                cache = dit.compact_cache(cfg, cache, nb * fs)
                content = post
            content += nb * fs
            blk, cache = denoise_block(
                params, cfg, pipe.scheduler, pipe.rope, ctx_kv, cache,
                noise[:, b * nb:(b + 1) * nb], k,
                pipe.denoising_step_list, start)
            rng, k2 = jax.random.split(rng)
            cache = refresh_block(params=params, cfg=cfg, rope=pipe.rope,
                                  ctx_kv=ctx_kv, cache=cache, x0=blk,
                                  rng=k2, context_noise=pipe.context_noise,
                                  start_frame=start)
            if with_taehv:
                px = streamer.decode_chunk(blk[:, :, :16].astype(jnp.bfloat16))
            start = start + nb
        float(jnp.ravel(px if with_taehv else blk)[0])
        steady_s = time.perf_counter() - t_steady
        steady_blocks = NBLOCKS - 4
        # 3 latent frames -> 12 pixel frames per steady block
        fps = steady_blocks * 12 / steady_s
        return steady_s / steady_blocks, fps

    run()  # compile
    per_block, fps = min((run() for _ in range(3)), key=lambda r: r[0])
    print(f"windowed steady state: {per_block * 1e3:.0f} ms/block "
          f"-> {fps:.1f} px-frames/s (latent window 12f, sink 1f, "
          f"{'incl. TAEHV decode, ' if with_taehv else ''}"
          f"constant per-block cost at ANY video length)")


if __name__ == "__main__":
    main()
