"""Wan DiT tests on tiny geometry.

The load-bearing invariant: the KV-cached streaming forward
(forward_inference, reference causal_model.py:725-893) must reproduce the
block-causal-masked training forward (forward_train, :895-1069) when fed
the same frames chunk by chunk — this is exactly what makes the reference's
train/inference pair coherent.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.ops.masks import block_causal_mask, teacher_forcing_mask

CFG = WanConfig(dim=96, ffn_dim=192, num_heads=2, num_layers=2,
                text_dim=32, freq_dim=16, num_frame_per_block=2)
B, F, C, H, W = 1, 4, 16, 8, 12
FS = (H // 2) * (W // 2)  # frame_seqlen = 24


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = dit.init_params(key, CFG, dtype=jnp.float32)
    rope = RopeTables.create(CFG.head_dim)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (B, F, C, H, W), jnp.float32)
    context = jax.random.normal(ks[1], (B, 20, CFG.text_dim), jnp.float32)
    return params, rope, x, context


def test_train_forward_shape(setup):
    params, rope, x, context = setup
    t = jnp.full((B, F), 500.0)
    mask = block_causal_mask(F, FS, CFG.num_frame_per_block)
    out = dit.forward_train(params, CFG, x, t, context, mask, rope)
    assert out.shape == (B, F, CFG.out_dim, H, W)
    assert np.isfinite(np.asarray(out)).all()


def test_kv_cache_matches_train_forward(setup):
    params, rope, x, context = setup
    nb = CFG.num_frame_per_block
    # per-block timesteps, same value within a block
    t_blocks = jnp.asarray([700.0, 300.0])
    t_full = jnp.repeat(t_blocks, nb)[None]  # [1, F]

    mask = block_causal_mask(F, FS, nb)
    ref = dit.forward_train(params, CFG, x, t_full, context, mask, rope,
                            remat=False)

    ctx_kv = dit.precompute_context(params, CFG, context)
    cache = dit.init_kv_cache(CFG, B, FS, F, dtype=jnp.float32)
    outs = []
    for blk in range(F // nb):
        xb = x[:, blk * nb:(blk + 1) * nb]
        tb = jnp.full((B, nb), t_blocks[blk])
        out, cache = dit.forward_inference(
            params, CFG, xb, tb, ctx_kv, cache,
            jnp.int32(blk * nb), rope)
        outs.append(out)
    stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_kv_cache_rewrite_same_block_is_idempotent(setup):
    """Re-running the same chunk (the 4-step denoise loop re-enters the same
    cache slots, causal_inference.py:188-221) must not corrupt indices."""
    params, rope, x, context = setup
    nb = CFG.num_frame_per_block
    ctx_kv = dit.precompute_context(params, CFG, context)
    cache = dit.init_kv_cache(CFG, B, FS, F, dtype=jnp.float32)
    xb = x[:, :nb]
    tb = jnp.full((B, nb), 900.0)
    out1, cache1 = dit.forward_inference(params, CFG, xb, tb, ctx_kv, cache,
                                         jnp.int32(0), rope)
    out2, cache2 = dit.forward_inference(params, CFG, xb, tb, ctx_kv, cache1,
                                         jnp.int32(0), rope)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)
    assert int(cache2.local_end) == nb * FS
    assert int(cache2.global_end) == nb * FS


def test_teacher_forcing_forward(setup):
    """Doubled [clean | noisy] sequence returns predictions for the noisy
    half only (causal_model.py:1061-1062)."""
    params, rope, x, context = setup
    t = jnp.full((B, F), 600.0)
    clean = jax.random.normal(jax.random.PRNGKey(7), x.shape, jnp.float32)
    mask = teacher_forcing_mask(F, FS, CFG.num_frame_per_block)
    out = dit.forward_train(params, CFG, x, t, context, mask, rope,
                            clean_x=clean, remat=False)
    assert out.shape == (B, F, CFG.out_dim, H, W)
    assert np.isfinite(np.asarray(out)).all()


def test_rolling_kv_cache_window():
    """local_attn_size windowed cache with eviction (causal_model.py:203-229):
    streaming with a rolled cache must equal attention over the last
    `local_attn_size` frames computed directly."""
    cfg = WanConfig(dim=96, ffn_dim=192, num_heads=2, num_layers=2,
                    text_dim=32, freq_dim=16, num_frame_per_block=1,
                    local_attn_size=2, sink_size=0)
    key = jax.random.PRNGKey(3)
    params = dit.init_params(key, cfg, dtype=jnp.float32)
    rope = RopeTables.create(cfg.head_dim)
    ks = jax.random.split(jax.random.PRNGKey(4), 2)
    F_total = 4
    x = jax.random.normal(ks[0], (B, F_total, C, H, W), jnp.float32)
    context = jax.random.normal(ks[1], (B, 8, cfg.text_dim), jnp.float32)
    ctx_kv = dit.precompute_context(params, cfg, context)

    cache = dit.init_kv_cache(cfg, B, FS, F_total, dtype=jnp.float32)
    assert cache.k.shape[2] == cfg.local_attn_size * FS
    stream = []
    for f in range(F_total):
        out, cache = dit.forward_inference(
            params, cfg, x[:, f:f + 1], jnp.full((B, 1), 100.0), ctx_kv,
            cache, jnp.int32(f), rope)
        stream.append(out)

    # oracle: per-frame forward over a fresh cache holding only the window
    mask = block_causal_mask(F_total, FS, 1, cfg.local_attn_size)
    ref = dit.forward_train(params, cfg, x, jnp.full((B, F_total), 100.0),
                            context, mask, rope, remat=False)
    got = jnp.concatenate(stream, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_windowed_slack_buffer_matches_default():
    """windowed_buffer_frames > local_attn_size (round-4 append-only
    streaming: blocks append with the two-interval sink window and the
    buffer compacts only when full) must produce the same outputs as the
    reference-sized buffer==window cache, including across a compaction
    (buffer 4, window 2, 7 one-frame blocks -> two compactions)."""
    base = dict(dim=96, ffn_dim=192, num_heads=2, num_layers=2,
                text_dim=32, freq_dim=16, num_frame_per_block=1,
                local_attn_size=2, sink_size=1)
    cfg_a = WanConfig(**base)
    cfg_b = WanConfig(**base, windowed_buffer_frames=4)
    key = jax.random.PRNGKey(11)
    params = dit.init_params(key, cfg_a, dtype=jnp.float32)
    rope = RopeTables.create(cfg_a.head_dim)
    ks = jax.random.split(jax.random.PRNGKey(12), 2)
    F_total = 7
    x = jax.random.normal(ks[0], (B, F_total, C, H, W), jnp.float32)
    context = jax.random.normal(ks[1], (B, 8, cfg_a.text_dim), jnp.float32)

    outs = {}
    for name, cfg in [("default", cfg_a), ("slack", cfg_b)]:
        ctx_kv = dit.precompute_context(params, cfg, context)
        cache = dit.init_kv_cache(cfg, B, FS, F_total, dtype=jnp.float32)
        stream = []
        for f in range(F_total):
            cache = dit.evict_for(cfg, cache, FS)
            out, cache = dit.forward_inference(
                params, cfg, x[:, f:f + 1], jnp.full((B, 1), 100.0),
                ctx_kv, cache, jnp.int32(f), rope)
            stream.append(out)
        outs[name] = jnp.concatenate(stream, axis=1)
    assert outs["slack"].shape == outs["default"].shape
    np.testing.assert_allclose(np.asarray(outs["slack"]),
                               np.asarray(outs["default"]),
                               rtol=2e-4, atol=2e-4)


def test_windowed_slack_buffer_no_evict_for():
    """forward_inference's internal compaction fallback (direct callers
    that never run evict_for) matches the evict_for-prepared path."""
    cfg = WanConfig(dim=96, ffn_dim=192, num_heads=2, num_layers=2,
                    text_dim=32, freq_dim=16, num_frame_per_block=1,
                    local_attn_size=2, sink_size=1,
                    windowed_buffer_frames=3)
    key = jax.random.PRNGKey(13)
    params = dit.init_params(key, cfg, dtype=jnp.float32)
    rope = RopeTables.create(cfg.head_dim)
    ks = jax.random.split(jax.random.PRNGKey(14), 2)
    F_total = 5
    x = jax.random.normal(ks[0], (B, F_total, C, H, W), jnp.float32)
    context = jax.random.normal(ks[1], (B, 8, cfg.text_dim), jnp.float32)
    ctx_kv = dit.precompute_context(params, cfg, context)

    outs = {}
    for name, pre in [("evict_for", True), ("internal", False)]:
        cache = dit.init_kv_cache(cfg, B, FS, F_total, dtype=jnp.float32)
        stream = []
        for f in range(F_total):
            if pre:
                cache = dit.evict_for(cfg, cache, FS)
            out, cache = dit.forward_inference(
                params, cfg, x[:, f:f + 1], jnp.full((B, 1), 100.0),
                ctx_kv, cache, jnp.int32(f), rope)
            stream.append(out)
        outs[name] = jnp.concatenate(stream, axis=1)
    np.testing.assert_allclose(np.asarray(outs["internal"]),
                               np.asarray(outs["evict_for"]),
                               rtol=1e-5, atol=1e-5)


def test_rope_plateau_beyond_table():
    """Streaming past the 1024-frame RoPE table must not crash: the
    temporal slice clamps (graceful plateau) where the reference's
    freqs[start:start+f] would come back short and crash
    (causal_model.py:44-52).  Positions inside the table are exact."""
    from self_forcing_tpu.models.wan.rope import MAX_POS, RopeTables
    rope = RopeTables.create(64)
    c_in, s_in = rope.angles_for_grid(2, 2, 2, jnp.int32(MAX_POS - 2))
    c_over, s_over = rope.angles_for_grid(2, 2, 2, jnp.int32(MAX_POS + 50))
    assert np.isfinite(np.asarray(c_over)).all()
    # clamped == the last in-table window
    np.testing.assert_array_equal(np.asarray(c_over), np.asarray(c_in))
    np.testing.assert_array_equal(np.asarray(s_over), np.asarray(s_in))
