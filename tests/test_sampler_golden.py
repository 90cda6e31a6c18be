"""Whole-sampler goldens vs the REFERENCE pipeline classes.

Runs the actual reference `CausalInferencePipeline` and
`SelfForcingTrainingPipeline` (pipeline/causal_inference.py:47-276,
pipeline/self_forcing_training.py:60-237) end-to-end on tiny geometry with
identical weights, noise, and denoising step list, and asserts the JAX
pipelines reproduce (a) the final latents of `inference()`, (b) the
training trajectory + denoised_timestep_from/to, and (c) the i2v-primed
variants.  This pins the sampler *semantics* (re-noise between list steps,
refresh-without-renoise at inference, refresh-with-renoise in training,
priming order) that module-level goldens cannot see.

Randomness is aligned by replaying the JAX pipelines' deterministic
key-split chain into the reference's `torch.randn_like` call sites.
"""
from __future__ import annotations

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.scheduler import FlowMatchScheduler
from self_forcing_tpu.utils.checkpoints import convert_dit_state_dict
from self_forcing_tpu.pipelines.causal_inference import CausalInferencePipeline
from self_forcing_tpu.pipelines.self_forcing_training import (
    SelfForcingTrainingPipeline,
)
from tests.reference_loader import REF, load_ref_module
from test_causal_golden import _load_ref_causal

CFG = WanConfig(dim=128, ffn_dim=256, num_heads=2, num_layers=2,
                text_dim=64, freq_dim=32, num_frame_per_block=2)
B, NB, C, H, W = 1, 2, 16, 8, 8
FS = (H // 2) * (W // 2)
STEPS = [1000, 750, 500, 250]
MAX_FRAMES = 21  # cache sized like the reference default rollout


def _load_ref_sampler_mods():
    """Load the reference pipeline modules with their real wan_wrapper /
    scheduler imports (only ftfy and the cuda-at-import demo_utils.memory
    are stubbed)."""
    import torch
    if "ref_pipe_causal_inference" in sys.modules:
        return (sys.modules["ref_pipe_causal_inference"],
                sys.modules["ref_pipe_self_forcing_training"],
                sys.modules["utils.wan_wrapper"])

    if not torch.cuda.is_available():
        # t5.py:478 evaluates torch.cuda.current_device() in a signature
        # default at import time
        torch.cuda.current_device = lambda: 0

    _load_ref_causal()  # wan packages + fp32-SDPA attention patch
    sys.modules["wan"].__path__ = [f"{REF}/wan"]
    sys.modules["wan.modules"].__path__ = [f"{REF}/wan/modules"]

    if "ftfy" not in sys.modules:
        import importlib.machinery
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        ftfy.__spec__ = importlib.machinery.ModuleSpec("ftfy", None)
        sys.modules["ftfy"] = ftfy

    def ensure(rel, name):
        mod = sys.modules.get(name)
        if mod is None or not getattr(mod, "__file__", None):
            load_ref_module(rel, name)

    ensure("wan/modules/tokenizers.py", "wan.modules.tokenizers")
    ensure("wan/modules/vae.py", "wan.modules.vae")
    ensure("wan/modules/t5.py", "wan.modules.t5")

    utils_pkg = sys.modules.get("utils") or types.ModuleType("utils")
    utils_pkg.__path__ = [f"{REF}/utils"]
    sys.modules["utils"] = utils_pkg
    ensure("utils/scheduler.py", "utils.scheduler")
    ensure("utils/lora.py", "utils.lora")
    ensure("utils/wan_wrapper.py", "utils.wan_wrapper")

    if not getattr(sys.modules.get("demo_utils.memory"), "_stub", False):
        demo_pkg = types.ModuleType("demo_utils")
        demo_pkg.__path__ = [f"{REF}/demo_utils"]
        mem = types.ModuleType("demo_utils.memory")
        mem._stub = True
        mem.cpu = torch.device("cpu")
        mem.gpu = torch.device("cpu")  # module-level cuda call in the real one
        mem.get_cuda_free_memory_gb = lambda *a, **k: 0.0
        mem.DynamicSwapInstaller = type("DynamicSwapInstaller", (), {})
        mem.move_model_to_device_with_memory_preservation = \
            lambda *a, **k: None
        sys.modules["demo_utils"] = demo_pkg
        sys.modules["demo_utils.memory"] = mem

    ci = load_ref_module("pipeline/causal_inference.py",
                         "ref_pipe_causal_inference")
    tr = load_ref_module("pipeline/self_forcing_training.py",
                         "ref_pipe_self_forcing_training")
    return ci, tr, sys.modules["utils.wan_wrapper"]


@pytest.fixture(scope="module")
def sampler_setup():
    import torch
    ci_mod, tr_mod, wrap_mod = _load_ref_sampler_mods()
    torch.manual_seed(0)
    causal_mod = sys.modules["wan.modules.causal_model"]
    model = causal_mod.CausalWanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=512, in_dim=C,
        dim=CFG.dim, ffn_dim=CFG.ffn_dim, freq_dim=CFG.freq_dim,
        text_dim=CFG.text_dim, out_dim=C, num_heads=CFG.num_heads,
        num_layers=CFG.num_layers, qk_norm=True, cross_attn_norm=True,
        eps=1e-6)
    with torch.no_grad():
        model.head.head.weight.normal_(0, 0.02)
        model.head.head.bias.normal_(0, 0.02)
    model = model.eval().float()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_dit_state_dict(sd, CFG, dtype=jnp.float32)
    ctx_np = np.random.default_rng(1).normal(
        size=(B, 24, CFG.text_dim)).astype(np.float32)
    return ci_mod, tr_mod, wrap_mod, model, params, ctx_np


def _make_ref_generator(wrap_mod, model, seq_len):
    """Reference WanDiffusionWrapper on the tiny model, bypassing the
    from_pretrained weight load in __init__ (utils/wan_wrapper.py:138-145)
    but keeping the class's own forward/conversion code."""
    import torch
    Wrap = wrap_mod.WanDiffusionWrapper
    gen = Wrap.__new__(Wrap)
    torch.nn.Module.__init__(gen)
    gen.model = model
    gen.uniform_timestep = False  # is_causal=True
    gen.scheduler = wrap_mod.FlowMatchScheduler(
        shift=8.0, sigma_min=0.0, extra_one_step=True)
    gen.scheduler.set_timesteps(1000, training=True)
    gen.seq_len = seq_len
    gen.post_init()
    return gen


def _patch_tiny_caches(pipe, cache_tokens):
    """Override the hardcoded 1.3B cache shapes
    (causal_inference.py:292, self_forcing_training.py:252)."""
    import torch

    def init_kv(batch_size, dtype, device):
        pipe.kv_cache1 = [
            {"k": torch.zeros(batch_size, cache_tokens, CFG.num_heads,
                              CFG.head_dim, dtype=dtype),
             "v": torch.zeros(batch_size, cache_tokens, CFG.num_heads,
                              CFG.head_dim, dtype=dtype),
             "global_end_index": torch.tensor([0], dtype=torch.long),
             "local_end_index": torch.tensor([0], dtype=torch.long)}
            for _ in range(CFG.num_layers)]

    def init_cross(batch_size, dtype, device):
        pipe.crossattn_cache = [
            {"k": torch.zeros(batch_size, 512, CFG.num_heads, CFG.head_dim,
                              dtype=dtype),
             "v": torch.zeros(batch_size, 512, CFG.num_heads, CFG.head_dim,
                              dtype=dtype),
             "is_init": False} for _ in range(CFG.num_layers)]

    pipe._initialize_kv_cache = init_kv
    pipe._initialize_crossattn_cache = init_cross
    pipe.frame_seq_length = FS
    pipe.num_transformer_blocks = CFG.num_layers


def _queue_randn_like(monkeypatch, queue):
    """Feed the reference's torch.randn_like sites from a precomputed
    queue (the JAX pipelines' key-split chain, replayed)."""
    import torch
    q = list(queue)

    def fake(t, *a, **k):
        assert q, "reference drew more noise than the JAX chain provides"
        e = q.pop(0)
        assert tuple(t.shape) == e.shape, (tuple(t.shape), e.shape)
        return torch.from_numpy(e).to(t.dtype)

    monkeypatch.setattr(torch, "randn_like", fake)
    return q


def _inference_eps_queue(rng, num_blocks):
    """Replay pipelines/causal_inference.py's draws: rng,k=split; per-block
    keys = split(k, num_blocks); one draw per non-final step."""
    _, k = jax.random.split(rng)
    rngs = jax.random.split(k, num_blocks)
    q = []
    for b in range(num_blocks):
        br = rngs[b]
        for _ in range(len(STEPS) - 1):
            br, kk = jax.random.split(br)
            q.append(np.asarray(jax.random.normal(
                kk, (B, NB, C, H, W), jnp.float32)).reshape(B * NB, C, H, W))
    return q


def _training_eps_queue(rng, num_blocks, exit_idx):
    """Replay pipelines/self_forcing_training.py's draws: rng1,rng2=split;
    per-block keys from rng2; `exit_idx` re-noise draws then the
    fold_in(7) refresh draw."""
    _, rng2 = jax.random.split(rng)
    rngs = jax.random.split(rng2, num_blocks)
    q = []
    for b in range(num_blocks):
        br = rngs[b]
        ex = exit_idx if isinstance(exit_idx, int) else int(exit_idx[b])
        for _ in range(ex):
            br, kk = jax.random.split(br)
            q.append(np.asarray(jax.random.normal(
                kk, (B, NB, C, H, W), jnp.float32)).reshape(B * NB, C, H, W))
        br = jax.random.fold_in(br, 7)
        q.append(np.asarray(jax.random.normal(
            br, (B, NB, C, H, W), jnp.float32)).reshape(B * NB, C, H, W))
    return q


def _my_args(context_noise=0):
    return SimpleNamespace(
        denoising_step_list=STEPS, warp_denoising_step=False,
        num_frame_per_block=NB, independent_first_frame=False,
        context_noise=context_noise, timestep_shift=8.0)


class _RefTextEncoder:
    def __init__(self, ctx_t):
        self.ctx_t = ctx_t

    def __call__(self, text_prompts):
        return {"prompt_embeds": self.ctx_t}


class _RefVAE:
    def decode_to_pixel(self, latents, use_cache=False):
        return latents


def _ref_inference_pipe(ci_mod, wrap_mod, model, ctx_t):
    gen = _make_ref_generator(wrap_mod, model, MAX_FRAMES * FS)
    pipe = ci_mod.CausalInferencePipeline(
        _my_args(), "cpu", generator=gen,
        text_encoder=_RefTextEncoder(ctx_t), vae=_RefVAE())
    _patch_tiny_caches(pipe, MAX_FRAMES * FS)
    return pipe


def test_inference_final_latents_match_reference(sampler_setup, monkeypatch):
    """(a) reference CausalInferencePipeline.inference vs ours: identical
    final latents from the same noise/weights/steps."""
    import torch
    ci_mod, _, wrap_mod, model, params, ctx_np = sampler_setup
    F = 2 * NB
    noise_np = np.random.default_rng(2).standard_normal(
        (B, F, C, H, W)).astype(np.float32) * 0.8

    rng = jax.random.PRNGKey(7)
    _queue_randn_like(monkeypatch, _inference_eps_queue(rng, F // NB))
    ref_pipe = _ref_inference_pipe(ci_mod, wrap_mod, model,
                                   torch.from_numpy(ctx_np))
    with torch.no_grad():
        _, ref_latents = ref_pipe.inference(
            torch.from_numpy(noise_np), ["prompt"], return_latents=True)

    my_pipe = CausalInferencePipeline(_my_args(), params, CFG)
    _, latents = my_pipe.inference(jnp.asarray(noise_np),
                                   context=jnp.asarray(ctx_np),
                                   return_latents=True, rng=rng)
    np.testing.assert_allclose(np.asarray(latents), ref_latents.numpy(),
                               rtol=5e-3, atol=5e-3)


def test_inference_i2v_primed_matches_reference(sampler_setup, monkeypatch):
    """(c) video-extension priming: one clean input block written to the
    cache at t=0 (causal_inference.py:157-169) before generation."""
    import torch
    ci_mod, _, wrap_mod, model, params, ctx_np = sampler_setup
    F = 2 * NB
    rng_np = np.random.default_rng(3)
    noise_np = rng_np.standard_normal((B, F, C, H, W)).astype(np.float32) * 0.8
    init_np = rng_np.standard_normal((B, NB, C, H, W)).astype(np.float32) * 0.5

    rng = jax.random.PRNGKey(9)
    _queue_randn_like(monkeypatch, _inference_eps_queue(rng, F // NB))
    ref_pipe = _ref_inference_pipe(ci_mod, wrap_mod, model,
                                   torch.from_numpy(ctx_np))
    with torch.no_grad():
        _, ref_latents = ref_pipe.inference(
            torch.from_numpy(noise_np), ["prompt"],
            initial_latent=torch.from_numpy(init_np), return_latents=True)

    my_pipe = CausalInferencePipeline(_my_args(), params, CFG)
    _, latents = my_pipe.inference(jnp.asarray(noise_np),
                                   context=jnp.asarray(ctx_np),
                                   initial_latent=jnp.asarray(init_np),
                                   return_latents=True, rng=rng)
    assert latents.shape == tuple(ref_latents.shape)  # includes input frames
    np.testing.assert_allclose(np.asarray(latents), ref_latents.numpy(),
                               rtol=5e-3, atol=5e-3)


def _ref_training_pipe(tr_mod, wrap_mod, model, context_noise, exits):
    import torch
    gen = _make_ref_generator(wrap_mod, model, MAX_FRAMES * FS)
    pipe = tr_mod.SelfForcingTrainingPipeline(
        denoising_step_list=torch.tensor(STEPS, dtype=torch.long),
        scheduler=gen.get_scheduler(), generator=gen,
        num_frame_per_block=NB, independent_first_frame=False,
        same_step_across_blocks=True, last_step_only=False,
        num_max_frames=MAX_FRAMES, context_noise=context_noise)
    _patch_tiny_caches(pipe, MAX_FRAMES * FS)
    pipe.kv_cache_size = MAX_FRAMES * FS
    pipe.generate_and_sync_list = \
        lambda num_blocks, num_steps, device: list(exits)
    return pipe


def _my_training_pipe(context_noise):
    sch = FlowMatchScheduler.create(1000, shift=8.0, training=True)
    return SelfForcingTrainingPipeline(
        STEPS, sch, num_frame_per_block=NB, independent_first_frame=False,
        same_step_across_blocks=True, last_step_only=False,
        num_max_frames=MAX_FRAMES, context_noise=context_noise,
        frame_seqlen=FS)


@pytest.mark.parametrize("exit_idx", [1, len(STEPS) - 1])
def test_training_trajectory_matches_reference(sampler_setup, monkeypatch,
                                               exit_idx):
    """(b) reference SelfForcingTrainingPipeline.inference_with_trajectory
    vs ours: trajectory AND denoised_timestep_from/to, mid-list and
    final-step exits, refresh re-noised at context_noise=100."""
    import torch
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    _, tr_mod, wrap_mod, model, params, ctx_np = sampler_setup
    F = 2 * NB
    noise_np = np.random.default_rng(4).standard_normal(
        (B, F, C, H, W)).astype(np.float32) * 0.8
    context_noise = 100

    rng = jax.random.PRNGKey(11)
    _queue_randn_like(monkeypatch,
                      _training_eps_queue(rng, F // NB, exit_idx))
    ref_pipe = _ref_training_pipe(tr_mod, wrap_mod, model, context_noise,
                                  [exit_idx] * (F // NB))
    with torch.no_grad():
        ref_out, ref_from, ref_to = ref_pipe.inference_with_trajectory(
            noise=torch.from_numpy(noise_np),
            prompt_embeds=torch.from_numpy(ctx_np))

    my_pipe = _my_training_pipe(float(context_noise))
    rope = RopeTables.create(CFG.head_dim)
    ctx_kv = dit.precompute_context(params, CFG, jnp.asarray(ctx_np))
    traj, tfrom, tto = my_pipe.inference_with_trajectory(
        params, CFG, rope, jnp.asarray(noise_np), ctx_kv, exit_idx, rng)

    # fp32 vs the reference's float64 flow->x0 conversions: a handful of
    # elements land ~1e-2 apart after the re-noise chain; semantics errors
    # would mismatch most elements at O(1)
    np.testing.assert_allclose(np.asarray(traj), ref_out.numpy(),
                               rtol=5e-3, atol=1.5e-2)
    assert (tfrom, tto) == (ref_from, ref_to)


def test_training_trajectory_i2v_matches_reference(sampler_setup,
                                                   monkeypatch):
    """(c) training rollout primed with a 1-frame initial latent
    (self_forcing_training.py:117-129)."""
    import torch
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    _, tr_mod, wrap_mod, model, params, ctx_np = sampler_setup
    F = 2 * NB
    rng_np = np.random.default_rng(5)
    noise_np = rng_np.standard_normal((B, F, C, H, W)).astype(np.float32) * 0.8
    init_np = rng_np.standard_normal((B, 1, C, H, W)).astype(np.float32) * 0.5
    exit_idx = 2

    rng = jax.random.PRNGKey(13)
    _queue_randn_like(monkeypatch,
                      _training_eps_queue(rng, F // NB, exit_idx))
    ref_pipe = _ref_training_pipe(tr_mod, wrap_mod, model, 0,
                                  [exit_idx] * (F // NB))
    with torch.no_grad():
        ref_out, _, _ = ref_pipe.inference_with_trajectory(
            noise=torch.from_numpy(noise_np),
            initial_latent=torch.from_numpy(init_np),
            prompt_embeds=torch.from_numpy(ctx_np))

    my_pipe = _my_training_pipe(0.0)
    rope = RopeTables.create(CFG.head_dim)
    ctx_kv = dit.precompute_context(params, CFG, jnp.asarray(ctx_np))
    traj, _, _ = my_pipe.inference_with_trajectory(
        params, CFG, rope, jnp.asarray(noise_np), ctx_kv, exit_idx, rng,
        initial_latent=jnp.asarray(init_np))

    assert traj.shape == tuple(ref_out.shape)  # input frame included
    np.testing.assert_allclose(np.asarray(traj), ref_out.numpy(),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_inference_windowed_sinks_matches_reference(sampler_setup,
                                                    monkeypatch):
    """(e) WINDOWED whole-sampler golden: the reference
    CausalInferencePipeline over a CausalWanModel built with
    local_attn_size/sink_size (rolling eviction + attention sinks,
    causal_model.py:203-229; window-sized cache per
    causal_inference.py:283-288) vs our windowed pipeline — including
    the round-4 append-buffer path (slack buffer must match too)."""
    import torch
    import dataclasses
    ci_mod, _, wrap_mod, _, _, ctx_np = sampler_setup
    causal_mod = sys.modules["wan.modules.causal_model"]
    LOCAL, SINK = 4, 1
    torch.manual_seed(11)
    model = causal_mod.CausalWanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=512, in_dim=C,
        dim=CFG.dim, ffn_dim=CFG.ffn_dim, freq_dim=CFG.freq_dim,
        text_dim=CFG.text_dim, out_dim=C, num_heads=CFG.num_heads,
        num_layers=CFG.num_layers, qk_norm=True, cross_attn_norm=True,
        eps=1e-6, local_attn_size=LOCAL, sink_size=SINK)
    with torch.no_grad():
        model.head.head.weight.normal_(0, 0.02)
        model.head.head.bias.normal_(0, 0.02)
    model = model.eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg_w = dataclasses.replace(CFG, local_attn_size=LOCAL, sink_size=SINK)
    params = convert_dit_state_dict(sd, cfg_w, dtype=jnp.float32)

    F = 4 * NB  # 4 blocks: eviction fires from block 3 on
    noise_np = np.random.default_rng(12).standard_normal(
        (B, F, C, H, W)).astype(np.float32) * 0.8
    rng = jax.random.PRNGKey(13)

    gen = _make_ref_generator(wrap_mod, model, LOCAL * FS)
    ref_pipe = ci_mod.CausalInferencePipeline(
        _my_args(), "cpu", generator=gen,
        text_encoder=_RefTextEncoder(torch.from_numpy(ctx_np)),
        vae=_RefVAE())
    # window-sized cache, the reference's windowed sizing
    _patch_tiny_caches(ref_pipe, LOCAL * FS)
    _queue_randn_like(monkeypatch, _inference_eps_queue(rng, F // NB))
    with torch.no_grad():
        _, ref_latents = ref_pipe.inference(
            torch.from_numpy(noise_np), ["prompt"], return_latents=True)

    for buf in (None, 8):  # reference sizing AND the round-4 slack buffer
        cfg_b = dataclasses.replace(cfg_w, windowed_buffer_frames=buf)
        my_pipe = CausalInferencePipeline(_my_args(), params, cfg_b)
        _, latents = my_pipe.inference(jnp.asarray(noise_np),
                                       context=jnp.asarray(ctx_np),
                                       return_latents=True, rng=rng)
        np.testing.assert_allclose(np.asarray(latents), ref_latents.numpy(),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f"buffer={buf}")
