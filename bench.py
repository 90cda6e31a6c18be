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
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _sync(x):
    """Reliable device sync: fetch ONE scalar element.

    jax.block_until_ready can return before execution finishes on the
    tunneled-TPU attachment when the array is produced by a chain of
    queued programs (measured: a 5 s VAE decode 'synced' in 0.4 ms; the
    next value fetch then absorbed the full 5 s).  A value fetch is the
    only trustworthy barrier; keep it to one element so the fetch itself
    stays at RTT cost."""
    return float(x[(0,) * x.ndim])


def _tpu_reachable(timeout_s: int = 180, attempts: int = 3,
                   retry_wait_s: int = 60) -> bool:
    """Probe the (tunneled) TPU in a subprocess: backend init HANGS when
    the axon tunnel is down (outages of hours observed), which would hang
    the whole bench — probe out-of-process with a hard timeout.

    The tunnel also FLAPS on a minutes timescale (observed: probe fails,
    an identical probe 20 min later succeeds), so retry a few times
    before demoting the run to the CPU smoke fallback."""
    import subprocess
    import sys
    for attempt in range(attempts):
        if attempt:
            log(f"bench: TPU probe retry {attempt + 1}/{attempts} "
                f"in {retry_wait_s}s (tunnel may be flapping)...")
            time.sleep(retry_wait_s)
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "x = jnp.ones((256, 256), jnp.bfloat16);"
                 "print(float(jnp.sum(jax.jit(lambda a: a@a)(x))))"],
                timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def main():
    from self_forcing_tpu.models.wan import dit, vae as vae_mod
    from self_forcing_tpu.models.wan.configs import WAN_1_3B, WanConfig
    from self_forcing_tpu.pipelines.causal_inference import (
        CausalInferencePipeline, denoise_block, refresh_block)
    from self_forcing_tpu.config import Config

    import os
    if os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu") \
            and not _tpu_reachable():
        log("bench: TPU tunnel unreachable — falling back to CPU smoke")
        jax.config.update("jax_platforms", "cpu")

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")

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
    vae_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    vae_params = jax.tree.map(
        lambda x: x.astype(vae_dtype),
        vae_mod.init_params(jax.random.fold_in(key, 1), vae_cfg))
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
    nb = cfg.num_frame_per_block

    ctx_kv = dit.precompute_context(params, cfg, context)
    fs = (H // 2) * (W // 2)

    # jitted streaming VAE decode programs (donated carried cache).  The
    # first block decodes FRAME-GRANULAR: frame 0 is its own program so
    # the first pixels reach the user after 1/9 of the first block's
    # decode work — exactly the reference demo's per-frame streaming
    # (demo.py pushes frames as they decode; its TRT VAE decodes per
    # frame).  TTFC is measured at that first visible frame.
    @functools.partial(jax.jit, donate_argnums=(2,))
    def vae_frame0(vp, z, cache):
        return vae_mod.decode_frame(vp, vae_cfg, z, cache, first=True)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def vae_rest(vp, z, cache):
        return vae_mod.decode_block(vp, vae_cfg, z, cache, first=False)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def vae_block(vp, z, cache):
        return vae_mod.decode_block(vp, vae_cfg, z, cache, first=False)

    def run_once(rng, cache):
        """Streaming loop: per-block denoise, overlapped VAE decode (JAX
        async dispatch overlaps the next block's DiT work with this
        block's decode).  ``cache`` buffers are reused across calls and
        reset (reference cache reuse, causal_inference.py:112-132) —
        re-zeroing 9.8 GB costs ~25 ms of TTFC.  Returns the donated-out
        cache for the next call."""
        cache = dit.reset_kv_cache(cache)
        t0 = time.perf_counter()
        ttfc = None
        dec_cache = None
        last_px = None
        start = jnp.int32(0)
        num_blocks = F // nb
        for b in range(num_blocks):
            rng, k = jax.random.split(rng)
            blk, cache = denoise_block(
                params, cfg, pipe.scheduler, pipe.rope, ctx_kv, cache,
                noise[:, b * nb:(b + 1) * nb], k, pipe.denoising_step_list,
                start, static_kv_hi=b * nb * fs)
            # decode dispatch BEFORE the cache refresh: TTFC excludes the
            # refresh forward (it only feeds the next block)
            lat = blk.transpose(0, 1, 3, 4, 2)[..., :zc].astype(vae_dtype)
            if dec_cache is None:
                dec_cache = vae_mod.init_decoder_cache(
                    vae_params, vae_cfg, B, H, W, vae_dtype)
                px0, dec_cache = vae_frame0(vae_params, lat[:, :1],
                                            dec_cache)
                _sync(px0)                 # first frame visible
                ttfc = time.perf_counter() - t0
                last_px, dec_cache = vae_rest(vae_params, lat[:, 1:],
                                              dec_cache)
            else:
                last_px, dec_cache = vae_block(vae_params, lat, dec_cache)
            if b < num_blocks - 1:
                rng, k2 = jax.random.split(rng)
                cache = refresh_block(params, cfg, pipe.rope, ctx_kv, cache,
                                      blk, k2, pipe.context_noise, start,
                                      static_kv_hi=b * nb * fs)
            start = start + nb
        _sync(last_px)
        total = time.perf_counter() - t0
        return total, ttfc, cache

    rng = jax.random.PRNGKey(42)
    log("bench: warmup/compile pass...")
    kv = dit.init_kv_cache(cfg, B, fs, max(F, 21), dtype)
    *_, kv = run_once(rng, kv)
    log("bench: timing...")

    times = []
    ttfcs = []
    for i in range(reps):
        total, ttfc, kv = run_once(jax.random.fold_in(rng, i), kv)
        times.append(total)
        ttfcs.append(ttfc)
        log(f"bench: rep {i}: {total:.2f}s total, ttfc {ttfc:.2f}s")

    best = min(times)
    fps = pixel_frames / best
    result = {
        "metric": "frames_per_sec_per_chip_1.3b_480p" if on_tpu
        else "frames_per_sec_cpu_smoke",
        "value": round(fps, 3),
        "unit": "frames/s",
        # CPU-smoke fallback runs a tiny model: comparing it against the
        # 16-fps TPU target would invite misreading — emit null instead
        "vs_baseline": round(fps / 16.0, 3) if on_tpu else None,
        "p50_ttfc_s": round(sorted(ttfcs)[len(ttfcs) // 2], 3),
        "total_s_81f": round(best, 3),
        "platform": platform,
    }

    if on_tpu:
        # ---- demo-speed configuration (the reference demo's real-time
        # toggles, demo.py:269-301: FP8-linears + TAEHV fast VAE —> here
        # W8A8 int8 linears + TAEHV): same chunk-wise AR sampler, traded
        # quality, reported as extra metrics alongside the parity number.
        from self_forcing_tpu.models import taehv as taehv_mod
        from self_forcing_tpu.ops.quant import quantize_dit_params

        # demo attention AND linears: chip-keyed variants (ops/chip.py; on
        # v5e int8qk attention + w8a8 linears — measured best; a v6e run
        # measures the registry's fp8 default instead of a stale
        # hardcode).  Override via SF_TPU_BENCH_QUANT for A/Bs.
        from self_forcing_tpu.ops.chip import chip_defaults
        quant_mode = os.environ.get("SF_TPU_BENCH_QUANT",
                                    chip_defaults()["matmul_quant"])
        qp = quantize_dit_params(params, mode=quant_mode)
        cfg_q = dataclasses.replace(
            cfg, attn_quant=chip_defaults()["demo_attn_quant"])
        ctx_kv_q = dit.precompute_context(qp, cfg_q, context)
        tae = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                           taehv_mod.init_decoder_params(
                               jax.random.fold_in(key, 7)))
        tae_decode = jax.jit(taehv_mod.decode_video,
                             static_argnames=("trim",))

        def run_demo(rng, cache):
            cache = dit.reset_kv_cache(cache)
            streamer = taehv_mod.TAEHVStreamer(tae, overlap=3,
                                               decode_fn=tae_decode)
            t0 = time.perf_counter()
            ttfc = None
            last_px = None
            start = jnp.int32(0)
            num_blocks = F // nb
            for b in range(num_blocks):
                rng, k = jax.random.split(rng)
                blk, cache = denoise_block(
                    qp, cfg_q, pipe.scheduler, pipe.rope, ctx_kv_q, cache,
                    noise[:, b * nb:(b + 1) * nb], k,
                    pipe.denoising_step_list, start,
                    static_kv_hi=b * nb * fs)
                lat = blk[:, :, :16].astype(jnp.bfloat16)  # [B,nb,C,H,W]
                last_px = streamer.decode_chunk(lat)
                if ttfc is None:
                    _sync(last_px)
                    ttfc = time.perf_counter() - t0
                if b < num_blocks - 1:
                    rng, k2 = jax.random.split(rng)
                    cache = refresh_block(params=qp, cfg=cfg_q, rope=pipe.rope,
                                          ctx_kv=ctx_kv_q, cache=cache,
                                          x0=blk, rng=k2,
                                          context_noise=pipe.context_noise,
                                          start_frame=start,
                                          static_kv_hi=b * nb * fs)
                start = start + nb
            _sync(last_px)
            return time.perf_counter() - t0, ttfc, cache

        log("bench: demo-speed config (w8a8 + TAEHV) warmup...")
        kv = dit.init_kv_cache(cfg, B, fs, max(F, 21), dtype)
        *_, kv = run_demo(jax.random.PRNGKey(17), kv)
        demo_times, demo_ttfcs = [], []
        for i in range(2):
            tt, tf, kv = run_demo(jax.random.fold_in(rng, 100 + i), kv)
            demo_times.append(tt)
            demo_ttfcs.append(tf)
            log(f"bench: demo rep {i}: {tt:.2f}s total, ttfc {tf:.2f}s")
        result["fps_demo_cfg_int8_taehv"] = round(
            pixel_frames / min(demo_times), 3)
        result["ttfc_demo_cfg_s"] = round(min(demo_ttfcs), 3)

        # ---- windowed (infinite-streaming) configuration: rolling
        # 12-frame window + 1 attention-sink frame — the reference's
        # unbounded-length story (causal_model.py:203-229) whose
        # per-block cost is CONSTANT at any video length.  Round 4
        # removed the per-block eviction roll (append-only buffer,
        # two-interval sink window, compressed kernel grid,
        # host-scheduled compaction).  Steady-state px-frames/s of the
        # denoise+refresh loop at the demo-speed config — same measure
        # as PERF.md's windowed tracking number.
        # free the global-path resident set first: the 24-frame windowed
        # cache (6.9 GB) does not fit next to the 21-frame global cache
        # + bf16 parity params (RESOURCE_EXHAUSTED otherwise; only the
        # int8 params + text context + the tiny TAEHV decoder are needed
        # below)
        pipe.params = None
        del kv, ctx_kv, ctx_kv_q, params, vae_params

        cfg_w = dataclasses.replace(cfg_q, local_attn_size=12, sink_size=1,
                                    windowed_buffer_frames=24)
        ctx_kv_w = dit.precompute_context(qp, cfg_w, context)
        NW = 12
        noise_w = jax.random.normal(jax.random.fold_in(key, 9),
                                    (B, NW * nb, C, H, W), dtype)
        buf_tok, post = dit.windowed_compaction_schedule(cfg_w, fs, nb * fs)

        def run_windowed(rng, with_decode=False):
            """Steady-state ms/block of the windowed loop.

            ``with_decode=True`` = the DRIVER-HONEST product path: the
            per-block TAEHV decode runs IN the loop (the serving loop
            decodes every block before the viewer sees it, reference
            demo.py:406-440) and the steady-state sync lands on the
            DECODED pixels — on one chip the decode's device time is
            additive (lookahead overlap hides host RTT, not device
            work), so this is what a viewer actually receives."""
            cache = dit.init_kv_cache(cfg_w, B, fs, NW * nb, dtype)
            streamer = taehv_mod.TAEHVStreamer(tae, overlap=3,
                                               decode_fn=tae_decode) \
                if with_decode else None
            start = jnp.int32(0)
            blk = None
            px = None
            t_steady = None
            content = 0
            for b in range(NW):
                rng, k = jax.random.split(rng)
                if b == 4:
                    _sync(px if with_decode else blk)
                    t_steady = time.perf_counter()
                if content + nb * fs > buf_tok:
                    cache = dit.compact_cache(cfg_w, cache, nb * fs)
                    content = post
                content += nb * fs
                blk, cache = denoise_block(
                    qp, cfg_w, pipe.scheduler, pipe.rope, ctx_kv_w, cache,
                    noise_w[:, b * nb:(b + 1) * nb], k,
                    pipe.denoising_step_list, start)
                if with_decode:
                    px = streamer.decode_chunk(
                        blk[:, :, :16].astype(jnp.bfloat16))
                rng, k2 = jax.random.split(rng)
                cache = refresh_block(params=qp, cfg=cfg_w, rope=pipe.rope,
                                      ctx_kv=ctx_kv_w, cache=cache, x0=blk,
                                      rng=k2,
                                      context_noise=pipe.context_noise,
                                      start_frame=start)
                start = start + nb
            _sync(px if with_decode else blk)
            steady = time.perf_counter() - t_steady
            return steady / (NW - 4)

        log("bench: windowed-streaming config warmup...")
        run_windowed(jax.random.PRNGKey(23))
        per_block = min(run_windowed(jax.random.fold_in(rng, 200 + i))
                        for i in range(2))
        # 3 latent frames -> 12 pixel frames per steady block
        result["fps_windowed_streaming"] = round(12 / per_block, 3)
        result["windowed_ms_per_block"] = round(per_block * 1e3, 1)

        # ---- windowed E2E (DiT loop + per-block TAEHV decode): the
        # number a viewer of the infinite stream receives (VERDICT r4
        # weak #1 — the DiT-loop metric above excludes the decode's
        # additive device time)
        log("bench: windowed e2e (incl. TAEHV decode) warmup...")
        run_windowed(jax.random.PRNGKey(29), with_decode=True)
        per_block_e2e = min(
            run_windowed(jax.random.fold_in(rng, 300 + i),
                         with_decode=True) for i in range(2))
        result["fps_windowed_e2e"] = round(12 / per_block_e2e, 3)
        result["windowed_e2e_ms_per_block"] = round(per_block_e2e * 1e3, 1)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
