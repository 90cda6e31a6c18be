"""Smoke + consistency tests for the many-step CFG pipelines on the tiny
config (reference quality path: bidirectional_diffusion_inference.py;
causal 50-step path: causal_diffusion_inference.py)."""
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WAN_TINY
from self_forcing_tpu.pipelines.bidirectional_diffusion_inference import (
    BidirectionalDiffusionInferencePipeline)
from self_forcing_tpu.pipelines.causal_diffusion_inference import (
    CausalDiffusionInferencePipeline)

B, F, C, H, W = 1, 4, 16, 8, 8


def _args(**kw):
    d = dict(num_train_timestep=1000, sampling_steps=4, guidance_scale=2.0,
             timestep_shift=8.0, shift=8.0, num_frame_per_block=2,
             independent_first_frame=False, negative_prompt="")
    d.update(kw)
    return types.SimpleNamespace(**d)


@pytest.fixture(scope="module")
def gen_params():
    return dit.init_params(jax.random.PRNGKey(0), WAN_TINY,
                           dtype=jnp.float32)


@pytest.fixture(scope="module")
def contexts():
    k = jax.random.PRNGKey(1)
    ctx = jax.random.normal(k, (B, 8, WAN_TINY.text_dim), jnp.float32)
    neg = jnp.zeros_like(ctx)
    return ctx, neg


def test_bidirectional_diffusion(gen_params, contexts):
    ctx, neg = contexts
    pipe = BidirectionalDiffusionInferencePipeline(
        _args(), gen_params, WAN_TINY)
    noise = jax.random.normal(jax.random.PRNGKey(2), (B, F, C, H, W))
    _, latents = pipe.inference(noise, context=ctx, neg_context=neg,
                                return_latents=True)
    assert latents.shape == (B, F, C, H, W)
    assert np.isfinite(np.asarray(latents)).all()


def test_causal_diffusion(gen_params, contexts):
    ctx, neg = contexts
    pipe = CausalDiffusionInferencePipeline(
        _args(), gen_params, WAN_TINY)
    noise = jax.random.normal(jax.random.PRNGKey(3), (B, F, C, H, W))
    _, latents = pipe.inference(noise, context=ctx, neg_context=neg,
                                return_latents=True)
    assert latents.shape == (B, F, C, H, W)
    assert np.isfinite(np.asarray(latents)).all()


def test_causal_diffusion_video_extension(gen_params, contexts):
    """initial_latent priming + start_frame_index RoPE offset run through."""
    ctx, neg = contexts
    pipe = CausalDiffusionInferencePipeline(
        _args(), gen_params, WAN_TINY)
    noise = jax.random.normal(jax.random.PRNGKey(4), (B, 2, C, H, W))
    init = jax.random.normal(jax.random.PRNGKey(5), (B, 2, C, H, W)) * 0.1
    _, latents = pipe.inference(noise, context=ctx, neg_context=neg,
                                initial_latent=init, return_latents=True,
                                start_frame_index=3)
    assert latents.shape == (B, 4, C, H, W)
    assert np.isfinite(np.asarray(latents)).all()
    np.testing.assert_allclose(np.asarray(latents[:, :2]), np.asarray(init))


def test_guidance_zero_matches_cond_only(gen_params, contexts):
    """With guidance_scale=1, CFG output = cond path; sanity identity:
    flow = u + 1*(c-u) = c."""
    ctx, _ = contexts
    noise = jax.random.normal(jax.random.PRNGKey(6), (B, F, C, H, W))
    p1 = BidirectionalDiffusionInferencePipeline(
        _args(guidance_scale=1.0), gen_params, WAN_TINY)
    _, l1 = p1.inference(noise, context=ctx, neg_context=ctx,
                         return_latents=True)
    _, l2 = p1.inference(noise, context=ctx,
                         neg_context=jnp.ones_like(ctx) * 5,
                         return_latents=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-3, atol=2e-3)
