"""Tensor-parallel DiT tests on the 8-device CPU mesh.

The reference has no tensor parallelism (SURVEY.md §2.8 'absent'); TP is
the TPU-native enabler for the Wan-14B chunk-wise AR stretch config
(BASELINE.json), so these tests pin forward_inference_tp/forward_train_tp
against the single-device forwards on the toy geometry.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.parallel import tensor as tp

# 4 heads so tp=4 leaves 1 local head; head_dim 32 keeps the rope split.
CFG = WanConfig(dim=128, ffn_dim=256, num_heads=4, num_layers=2,
                text_dim=64, freq_dim=32, num_frame_per_block=2)

needs4 = pytest.mark.skipif(len(jax.devices()) < 4,
                            reason="needs >= 4 devices")


def _setup(key=0):
    k = jax.random.PRNGKey(key)
    params = dit.init_params(k, CFG, dtype=jnp.float32)
    rope = RopeTables.create(CFG.head_dim)
    ctx = jax.random.normal(jax.random.fold_in(k, 1), (1, 16, CFG.text_dim),
                            jnp.float32)
    return params, rope, ctx


@needs4
@pytest.mark.slow
def test_forward_inference_tp_matches_single():
    """Two consecutive cached blocks through the TP forward match the
    single-device forward, including the carried head-sharded cache."""
    params, rope, ctx = _setup()
    mesh = tp.tp_mesh(4)
    B, F, C, H, W = 1, 2, 16, 8, 8
    fs = (H // 2) * (W // 2)
    key = jax.random.PRNGKey(7)

    ctx_kv = dit.precompute_context(params, CFG, ctx)
    ctx_kv_tp = tp.precompute_context_tp(params, CFG, ctx, mesh)
    for k in ctx_kv:
        np.testing.assert_allclose(np.asarray(ctx_kv_tp[k]),
                                   np.asarray(ctx_kv[k]),
                                   rtol=2e-5, atol=2e-5)

    cache = dit.init_kv_cache(CFG, B, fs, 4, jnp.float32)
    cache_tp = tp.init_kv_cache_tp(CFG, mesh, B, fs, 4, jnp.float32)
    params_tp = tp.shard_params_tp(params, mesh)

    for blk in range(2):
        x = jax.random.normal(jax.random.fold_in(key, blk),
                              (B, F, C, H, W), jnp.float32)
        t = jnp.full((B, F), 500.0, jnp.float32)
        start = jnp.int32(blk * F)
        ref, cache = dit.forward_inference(params, CFG, x, t, ctx_kv,
                                           cache, start, rope)
        out, cache_tp = tp.forward_inference_tp(params_tp, CFG, x, t,
                                                ctx_kv_tp, cache_tp,
                                                start, rope, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        # the head-sharded cache holds the same values as the dense one
        np.testing.assert_allclose(np.asarray(cache_tp.k),
                                   np.asarray(cache.k),
                                   rtol=2e-4, atol=2e-4)
        assert float(cache_tp.kmax.max()) >= float(cache.kmax.max()) - 1e-5


@needs4
def test_forward_train_tp_matches_single():
    params, rope, ctx = _setup(1)
    mesh = tp.tp_mesh(4)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16, 8, 8),
                          jnp.float32)
    t = jnp.full((1, 4), 600.0, jnp.float32)
    ref = dit.forward_train(params, CFG, x, t, ctx, None, rope, remat=False)
    params_tp = tp.shard_params_tp(params, mesh)
    out = tp.forward_train_tp(params_tp, CFG, x, t, ctx, None, rope, mesh,
                              remat=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@needs4
@pytest.mark.slow
def test_forward_train_tp_grads_match():
    """Gradients w.r.t. the sharded params match the single-device grads
    (sliced to the local shard) — TP is trainable, not inference-only."""
    params, rope, ctx = _setup(2)
    mesh = tp.tp_mesh(4)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 16, 8, 8),
                          jnp.float32)
    t = jnp.full((1, 2), 300.0, jnp.float32)

    def loss_single(p):
        return jnp.sum(dit.forward_train(p, CFG, x, t, ctx, None, rope,
                                         remat=False) ** 2)

    def loss_tp(p):
        return jnp.sum(tp.forward_train_tp(p, CFG, x, t, ctx, None, rope,
                                           mesh, remat=False) ** 2)

    g_ref = jax.grad(loss_single)(params)
    params_tp = tp.shard_params_tp(params, mesh)
    g_tp = jax.grad(loss_tp)(params_tp)
    for path in (("blocks", "self_attn", "q", "w"),
                 ("blocks", "self_attn", "o", "w"),
                 ("blocks", "ffn", "fc1", "b"),
                 ("patch_embedding", "w")):
        a = g_ref
        b = g_tp
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


@needs4
@pytest.mark.slow
def test_denoise_refresh_block_tp_match_single():
    """A full streaming step (4-step denoise + cache refresh) through the
    TP wrappers matches the single-device pipeline ops."""
    from self_forcing_tpu.pipelines.causal_inference import (denoise_block,
                                                             refresh_block)
    from self_forcing_tpu.scheduler import FlowMatchScheduler

    params, rope, ctx = _setup(4)
    mesh = tp.tp_mesh(4)
    sched = FlowMatchScheduler.create(1000, shift=8.0)
    B, F, C, H, W = 1, 2, 16, 8, 8
    fs = (H // 2) * (W // 2)
    steps = (1000.0, 500.0)
    rng = jax.random.PRNGKey(11)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), (B, F, C, H, W),
                              jnp.float32)

    ctx_kv = dit.precompute_context(params, CFG, ctx)
    ctx_kv_tp = tp.precompute_context_tp(params, CFG, ctx, mesh)
    params_tp = tp.shard_params_tp(params, mesh)
    cache = dit.init_kv_cache(CFG, B, fs, 4, jnp.float32)
    cache_tp = tp.init_kv_cache_tp(CFG, mesh, B, fs, 4, jnp.float32)

    x0_ref, cache = denoise_block(params, CFG, sched, rope, ctx_kv, cache,
                                  noise, rng, steps, jnp.int32(0),
                                  static_kv_hi=0)
    x0_tp, cache_tp = tp.denoise_block_tp(params_tp, CFG, sched, rope,
                                          ctx_kv_tp, cache_tp, noise, rng,
                                          steps, jnp.int32(0), mesh,
                                          static_kv_hi=0)
    np.testing.assert_allclose(np.asarray(x0_tp), np.asarray(x0_ref),
                               rtol=5e-4, atol=5e-4)

    cache = refresh_block(params, CFG, rope, ctx_kv, cache, x0_ref, rng,
                          0.0, jnp.int32(0), static_kv_hi=0)
    cache_tp = tp.refresh_block_tp(params_tp, CFG, rope, ctx_kv_tp,
                                   cache_tp, x0_tp, rng, 0.0, jnp.int32(0),
                                   mesh, static_kv_hi=0)
    np.testing.assert_allclose(np.asarray(cache_tp.k), np.asarray(cache.k),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(cache_tp.v), np.asarray(cache.v),
                               rtol=5e-4, atol=5e-4)


@needs4
def test_tp_rejects_quantized_params():
    """W8A8 params bypass the TP psums — sharding them must be refused."""
    from self_forcing_tpu.ops.quant import quantize_dit_params
    params, _, _ = _setup(9)
    qp = quantize_dit_params(params, min_dim=1, mode="w8a8")
    with pytest.raises(ValueError, match="quantized"):
        tp.tp_param_specs(qp)


@needs4
@pytest.mark.slow
def test_causal_pipeline_tp_matches_single():
    """The full CausalInferencePipeline under a ('tp',) mesh — context
    precompute, i2v priming, the whole-video block scan, and the
    streaming generator — matches the single-device pipeline."""
    import types

    from self_forcing_tpu.pipelines.causal_inference import (
        CausalInferencePipeline)

    params, rope, ctx = _setup(6)
    mesh = tp.tp_mesh(4)
    params_tp = tp.shard_params_tp(params, mesh)
    args = types.SimpleNamespace(
        denoising_step_list=[1000, 500], num_frame_per_block=2,
        independent_first_frame=False, context_noise=0.0,
        timestep_shift=8.0)

    B, F, C, H, W = 1, 4, 16, 8, 8
    noise = jax.random.normal(jax.random.PRNGKey(12), (B, F, C, H, W),
                              jnp.float32)
    init = 0.1 * jax.random.normal(jax.random.PRNGKey(13),
                                   (B, 2, C, H, W), jnp.float32)

    pipe = CausalInferencePipeline(args, params, CFG)
    pipe_tp = CausalInferencePipeline(args, params_tp, CFG, mesh=mesh)

    _, lat = pipe.inference(noise, context=ctx, initial_latent=init,
                            return_latents=True)
    _, lat_tp = pipe_tp.inference(noise, context=ctx, initial_latent=init,
                                  return_latents=True)
    assert lat_tp.shape == lat.shape
    np.testing.assert_allclose(np.asarray(lat_tp), np.asarray(lat),
                               rtol=5e-4, atol=5e-4)

    chunks = list(pipe.stream(noise, ctx))
    chunks_tp = list(pipe_tp.stream(noise, ctx))
    assert len(chunks_tp) == len(chunks) == F // 2
    for a, b in zip(chunks, chunks_tp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


@needs4
@pytest.mark.slow
def test_causal_pipeline_tp_windowed_stream_matches_single():
    """Windowed (append-buffer + sink window + host-scheduled
    compaction, round 4) streaming under a ('tp',) mesh: the pipeline's
    dit.compact_cache runs on the head-sharded TP cache via GSPMD and
    the stream matches the single-device windowed stream."""
    import types

    from self_forcing_tpu.pipelines.causal_inference import (
        CausalInferencePipeline)

    cfg = dataclasses.replace(CFG, local_attn_size=4, sink_size=1,
                              windowed_buffer_frames=8)
    params, rope, ctx = _setup(21)
    mesh = tp.tp_mesh(4)
    params_tp = tp.shard_params_tp(params, mesh)
    args = types.SimpleNamespace(
        denoising_step_list=[1000, 500], num_frame_per_block=2,
        independent_first_frame=False, context_noise=0.0,
        timestep_shift=8.0)
    B, F, C, H, W = 1, 10, 16, 8, 8  # 5 blocks: compaction fires twice
    noise = jax.random.normal(jax.random.PRNGKey(22), (B, F, C, H, W),
                              jnp.float32)

    pipe = CausalInferencePipeline(args, params, cfg)
    pipe_tp = CausalInferencePipeline(args, params_tp, cfg, mesh=mesh)
    chunks = list(pipe.stream(noise, ctx))
    chunks_tp = list(pipe_tp.stream(noise, ctx))
    assert len(chunks_tp) == len(chunks) == F // 2
    for a, b in zip(chunks, chunks_tp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)
