"""End-to-end tiny-geometry pipeline tests (reference: configs/tiny_test.yaml
spirit — CPU-runnable, random weights)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_forcing_tpu.config import Config
from self_forcing_tpu.models.wan import dit, vae as jvae
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.pipelines.causal_inference import CausalInferencePipeline
from self_forcing_tpu.pipelines.bidirectional_inference import (
    BidirectionalInferencePipeline,
)

CFG = WanConfig(dim=96, ffn_dim=192, num_heads=2, num_layers=2,
                text_dim=32, freq_dim=16, num_frame_per_block=2)
B, F, C, H, W = 1, 6, 16, 8, 8   # latent geometry; pixels 64x64


ARGS = Config({
    "denoising_step_list": [1000, 750, 500, 250],
    "warp_denoising_step": True,
    "timestep_shift": 5.0,
    "num_frame_per_block": 2,
    "independent_first_frame": False,
    "context_noise": 0,
})


@pytest.fixture(scope="module")
def setup():
    gen = dit.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    context = jax.random.normal(jax.random.PRNGKey(1), (B, 10, CFG.text_dim),
                                jnp.float32)
    return gen, context


def test_causal_inference_latents(setup):
    gen, context = setup
    pipe = CausalInferencePipeline(ARGS, gen, CFG)
    noise = jax.random.normal(jax.random.PRNGKey(2), (B, F, C, H, W),
                              jnp.float32)
    video, latents = pipe.inference(noise, context=context,
                                    return_latents=True)
    assert video is None  # no VAE params passed
    assert latents.shape == (B, F, C, H, W)
    assert np.isfinite(np.asarray(latents)).all()


def test_causal_inference_with_vae(setup):
    gen, context = setup
    vae_cfg = jvae.VAE_TINY
    # tiny VAE z_dim=4 != DiT latent 16; use a DiT cfg with out_dim=4
    cfg4 = WanConfig(dim=96, ffn_dim=192, num_heads=2, num_layers=2,
                     text_dim=32, freq_dim=16, in_dim=4, out_dim=4,
                     num_frame_per_block=2)
    gen4 = dit.init_params(jax.random.PRNGKey(3), cfg4, dtype=jnp.float32)
    vp = jvae.init_params(jax.random.PRNGKey(4), vae_cfg)
    pipe = CausalInferencePipeline(ARGS, gen4, cfg4, vae_params=vp,
                                   vae_cfg=vae_cfg)
    F2 = 4  # -> 1 + 3*4 = 13 pixel frames
    noise = jax.random.normal(jax.random.PRNGKey(5), (B, F2, 4, H, W),
                              jnp.float32)
    video = pipe.inference(noise, context=context, profile=True)
    assert video.shape == (B, 1 + (F2 - 1) * 4, 3, H * 8, W * 8)
    v = np.asarray(video)
    assert np.isfinite(v).all() and v.min() >= 0 and v.max() <= 1


def test_stream_matches_batch_inference(setup):
    """Per-block streaming must produce the same latents as the one-shot
    scan (same rng folding)."""
    gen, context = setup
    pipe = CausalInferencePipeline(ARGS, gen, CFG)
    noise = jax.random.normal(jax.random.PRNGKey(6), (B, F, C, H, W),
                              jnp.float32)
    chunks = list(pipe.stream(noise, context, rng=jax.random.PRNGKey(7)))
    assert len(chunks) == F // 2
    stream_lat = jnp.concatenate(chunks, axis=1)
    assert stream_lat.shape == (B, F, C, H, W)
    assert np.isfinite(np.asarray(stream_lat)).all()


def test_video_extension_priming(setup):
    """initial_latent path: cache priming then generation continues from
    the correct start frame (causal_inference.py:136-169)."""
    gen, context = setup
    pipe = CausalInferencePipeline(ARGS, gen, CFG)
    initial = jax.random.normal(jax.random.PRNGKey(8), (B, 2, C, H, W),
                                jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(9), (B, 4, C, H, W),
                              jnp.float32)
    _, latents = pipe.inference(noise, context=context,
                                initial_latent=initial, return_latents=True)
    assert latents.shape == (B, 6, C, H, W)
    np.testing.assert_allclose(np.asarray(latents[:, :2]),
                               np.asarray(initial))


def test_bidirectional_inference(setup):
    gen, context = setup
    pipe = BidirectionalInferencePipeline(ARGS, gen, CFG)
    noise = jax.random.normal(jax.random.PRNGKey(10), (B, F, C, H, W),
                              jnp.float32)
    out = pipe.inference(noise, context)
    assert out.shape == (B, F, C, H, W)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_denoise_write_cache_dead_store_equivalence():
    """The streaming sampler's intermediate cache writes are dead stores:
    forcing write_cache=True inside the denoise steps must not change the
    output (the refresh pass provides the next block's context)."""
    import dataclasses
    import types
    from self_forcing_tpu.models.wan import dit
    from self_forcing_tpu.models.wan.configs import WAN_TINY
    from self_forcing_tpu.pipelines import causal_inference as ci

    cfg = dataclasses.replace(WAN_TINY, num_frame_per_block=2)
    B, F, C, H, W = 1, 6, 16, 8, 8
    key = jax.random.PRNGKey(0)
    params = dit.init_params(key, cfg, dtype=jnp.float32)
    params["head"]["head"]["w"] = 0.02 * jax.random.normal(
        jax.random.fold_in(key, 9), params["head"]["head"]["w"].shape)
    args = types.SimpleNamespace(
        denoising_step_list=[1000, 500], warp_denoising_step=False,
        num_frame_per_block=2, independent_first_frame=False,
        context_noise=100, timestep_shift=8.0)
    pipe = ci.CausalInferencePipeline(args, params, cfg)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (B, F, C, H, W))
    ctx = jax.random.normal(jax.random.fold_in(key, 2), (B, 8, cfg.text_dim))

    def run():
        out = []
        for blk in pipe.stream(noise, ctx, rng=jax.random.PRNGKey(3)):
            out.append(np.asarray(blk))
        return np.concatenate(out, axis=1)

    a = run()
    orig = dit.forward_inference
    def forced(*f_args, **kw):
        kw["write_cache"] = True
        return orig(*f_args, **kw)
    dit.forward_inference = forced
    try:
        ci.denoise_block.clear_cache()
        ci.refresh_block.clear_cache()
        b_out = run()
    finally:
        dit.forward_inference = orig
        ci.denoise_block.clear_cache()
        ci.refresh_block.clear_cache()
    np.testing.assert_allclose(a, b_out, rtol=1e-5, atol=1e-5)


def test_inference_stream_interleave_cache_reuse():
    """inference() -> stream() -> inference() with matching geometry: the
    cache-reuse path must survive donation (stream donates the buffers
    self._cache aliased; regression: 'Array has been deleted')."""
    import dataclasses as dc
    from self_forcing_tpu.config import Config
    from self_forcing_tpu.models.wan import dit
    from self_forcing_tpu.models.wan.configs import WAN_TINY
    from self_forcing_tpu.pipelines.causal_inference import (
        CausalInferencePipeline)

    cfg = dc.replace(WAN_TINY, num_frame_per_block=1)
    params = dit.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    args = Config({"denoising_step_list": [1000, 500],
                   "warp_denoising_step": False, "timestep_shift": 8.0,
                   "num_frame_per_block": 1,
                   "independent_first_frame": False, "context_noise": 0})
    pipe = CausalInferencePipeline(args, params, cfg)
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 16, 8, 8),
                              jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.text_dim),
                            jnp.float32)

    _, lat1 = pipe.inference(noise, context=ctx, return_latents=True)
    chunks = list(pipe.stream(noise, ctx))
    assert len(chunks) == 2
    _, lat2 = pipe.inference(noise, context=ctx, return_latents=True)
    np.testing.assert_allclose(np.asarray(lat1), np.asarray(lat2),
                               rtol=1e-5, atol=1e-5)
    # abandoning a stream mid-way must not leave a stale cache behind
    gen = pipe.stream(noise, ctx)
    next(gen)
    gen.close()
    _, lat3 = pipe.inference(noise, context=ctx, return_latents=True)
    np.testing.assert_allclose(np.asarray(lat1), np.asarray(lat3),
                               rtol=1e-5, atol=1e-5)


def test_quantized_compounded_error_bound():
    """End-to-end compounded quantization error (VERDICT r3 item 2 /
    r4 next #4): the quantized-linear stack through ALL layers x every
    denoise forward x the re-noise chain of a streamed 3-block video
    stays within a small relative error of the parity rollout — the
    sampler's x0-reprediction CONTRACTS per-forward perturbations
    instead of compounding them (measured ~4e-4 rel for w8a8 at tiny
    geometry; per-op error is ~10x larger).  The fp8 e4m3 mode (the
    literal torchao-FP8 analog the v6e registry defaults to, reference
    demo.py:277-283) gets the same pin — on CPU/v5e XLA upcasts the
    e4m3 dot, so the test exercises exactly the quantize/dequantize
    numerics v6e would see.  The int8qk attention compound is measured
    on real TPU (scripts/bench_quality.py; PERF.md round-4 table)."""
    import dataclasses
    from self_forcing_tpu.models.wan import dit
    from self_forcing_tpu.models.wan.configs import WAN_TINY
    from self_forcing_tpu.pipelines.causal_inference import (
        CausalInferencePipeline)
    from self_forcing_tpu.config import Config
    from self_forcing_tpu.ops.quant import quantize_dit_params

    cfg = dataclasses.replace(WAN_TINY, num_frame_per_block=2)
    key = jax.random.PRNGKey(0)
    params = dit.init_params(key, cfg, dtype=jnp.float32)
    params["head"]["head"]["w"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(3), params["head"]["head"]["w"].shape)
    args = Config({"denoising_step_list": [1000, 750, 500, 250],
                   "warp_denoising_step": True, "timestep_shift": 8.0,
                   "num_frame_per_block": 2,
                   "independent_first_frame": False, "context_noise": 0})
    B, F, C, H, W = 1, 6, 16, 8, 8
    noise = jax.random.normal(jax.random.fold_in(key, 1), (B, F, C, H, W),
                              jnp.float32)
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (B, 8, cfg.text_dim), jnp.float32)
    outs = {}
    for name, p in [("parity", params),
                    ("w8a8", quantize_dit_params(params, min_dim=64,
                                                 mode="w8a8")),
                    ("fp8", quantize_dit_params(params, min_dim=64,
                                                mode="fp8"))]:
        pipe = CausalInferencePipeline(args, p, cfg)
        chunks = [np.asarray(c)
                  for c in pipe.stream(noise, ctx, rng=jax.random.PRNGKey(7))]
        outs[name] = np.concatenate(chunks, axis=1)
    denom = np.abs(outs["parity"]).mean()
    for mode, bound in [("w8a8", 5e-3), ("fp8", 1e-2)]:
        d = np.abs(outs[mode] - outs["parity"])
        assert d.mean() / denom < bound, (mode, d.mean() / denom)
        # no frame drifts worse than the bound either (later frames see
        # quantized context through the KV cache)
        per_frame = d.mean(axis=(0, 2, 3, 4)) / denom
        assert per_frame.max() < bound, (mode, per_frame)


@pytest.mark.slow
def test_windowed_stream_slack_buffer_matches_default():
    """Streaming-path equivalence of the round-4 windowed re-architecture
    (append-only slack buffer + host-scheduled compaction inside
    pipe.stream) against the reference-sized buffer==window cache — the
    stream loop drives dit.compact_cache on the static block cadence
    (twice over 5 blocks at buffer 8 / window 4 / 2-frame blocks)."""
    import dataclasses
    base = dict(dim=96, ffn_dim=192, num_heads=2, num_layers=2,
                text_dim=32, freq_dim=16, num_frame_per_block=2,
                local_attn_size=4, sink_size=1)
    cfg_a = WanConfig(**base)
    cfg_b = WanConfig(**base, windowed_buffer_frames=8)
    args = Config({"denoising_step_list": [1000, 500],
                   "warp_denoising_step": False, "timestep_shift": 5.0,
                   "num_frame_per_block": 2,
                   "independent_first_frame": False, "context_noise": 0})
    key = jax.random.PRNGKey(0)
    params = dit.init_params(key, cfg_a, dtype=jnp.float32)
    B, F, C, H, W = 1, 10, 16, 8, 8
    noise = jax.random.normal(jax.random.fold_in(key, 1),
                              (B, F, C, H, W), jnp.float32)
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (B, 8, 32), jnp.float32)
    outs = {}
    for name, cfg in [("win", cfg_a), ("slack", cfg_b)]:
        pipe = CausalInferencePipeline(args, params, cfg)
        chunks = list(pipe.stream(noise, ctx, rng=jax.random.PRNGKey(7)))
        outs[name] = np.concatenate([np.asarray(c) for c in chunks], axis=1)
    np.testing.assert_allclose(outs["slack"], outs["win"],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_windowed_stream_independent_first_frame_slack():
    """Windowed streaming with independent_first_frame: the 1-frame
    first block makes the block cadence NON-uniform — the host
    compaction schedule and the two-interval window bookkeeping must
    still match the reference-sized buffer (bit-exact; an odd-7-frame
    slack buffer forces a misaligned compaction)."""
    import dataclasses
    base = dict(dim=96, ffn_dim=192, num_heads=2, num_layers=2,
                text_dim=32, freq_dim=16, num_frame_per_block=2,
                local_attn_size=4, sink_size=1,
                independent_first_frame=True)
    args = Config({"denoising_step_list": [1000, 500],
                   "warp_denoising_step": False, "timestep_shift": 5.0,
                   "num_frame_per_block": 2,
                   "independent_first_frame": True, "context_noise": 0})
    key = jax.random.PRNGKey(0)
    cfg_a = WanConfig(**base)
    cfg_b = WanConfig(**base, windowed_buffer_frames=7)
    params = dit.init_params(key, cfg_a, dtype=jnp.float32)
    B, F, C, H, W = 1, 9, 16, 8, 8  # 1 + 4x2
    noise = jax.random.normal(jax.random.fold_in(key, 1),
                              (B, F, C, H, W), jnp.float32)
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (B, 8, 32), jnp.float32)
    outs = {}
    for name, cfg in [("win", cfg_a), ("slack", cfg_b)]:
        pipe = CausalInferencePipeline(args, params, cfg)
        chunks = list(pipe.stream(noise, ctx, rng=jax.random.PRNGKey(7)))
        outs[name] = np.concatenate([np.asarray(c) for c in chunks], axis=1)
    np.testing.assert_allclose(outs["slack"], outs["win"],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_windowed_long_horizon_matches_rolled_cache():
    """Long-horizon windowed equivalence (VERDICT r4 next #7): a 16-block
    stream through the round-4 append-only slack buffer — ~11
    host-scheduled compactions — must still match the reference-semantics
    rolled cache (buffer == window, evicted every steady-state block,
    content-identical to causal_model.py:203-229) on the LATE blocks.
    The default-lane equivalence test covers <= 2 compactions; this pins
    that compaction does not drift over many repetitions."""
    import dataclasses
    base = dict(dim=96, ffn_dim=192, num_heads=2, num_layers=2,
                text_dim=32, freq_dim=16, num_frame_per_block=2,
                local_attn_size=4, sink_size=1)
    cfg_roll = WanConfig(**base)                       # reference sizing
    cfg_slack = WanConfig(**base, windowed_buffer_frames=8)
    args = Config({"denoising_step_list": [1000, 500],
                   "warp_denoising_step": False, "timestep_shift": 5.0,
                   "num_frame_per_block": 2,
                   "independent_first_frame": False, "context_noise": 0})
    key = jax.random.PRNGKey(0)
    params = dit.init_params(key, cfg_roll, dtype=jnp.float32)
    B, F, C, H, W = 1, 32, 16, 8, 8                    # 16 blocks
    noise = jax.random.normal(jax.random.fold_in(key, 1),
                              (B, F, C, H, W), jnp.float32)
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (B, 8, 32), jnp.float32)
    outs = {}
    for name, cfg in [("roll", cfg_roll), ("slack", cfg_slack)]:
        pipe = CausalInferencePipeline(args, params, cfg)
        chunks = list(pipe.stream(noise, ctx, rng=jax.random.PRNGKey(7)))
        assert len(chunks) == 16
        outs[name] = np.concatenate([np.asarray(c) for c in chunks], axis=1)
    # whole stream equal, and explicitly the LAST blocks (the ones that
    # sit behind every compaction) — fp32 bit-level tolerance
    np.testing.assert_allclose(outs["slack"], outs["roll"],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(outs["slack"][:, -8:], outs["roll"][:, -8:],
                               rtol=2e-5, atol=2e-5)
