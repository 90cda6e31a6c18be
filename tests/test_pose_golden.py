"""Golden tests: UniAnimate pose-embedding CNNs vs the reference torch
modules (pipeline/causal_diffusion_inference.py:87-122), loaded from
/root/reference with the pipeline's heavy imports stubbed.

Validates the conv stride/padding translation (torch Conv3d/Conv2d
padding=1 -> explicit JAX padding), the OIDHW->DHWIO weight conversion in
conditioning.load_pose_embedding_weights, and prepare_dwpose_input's
frame prepending against the reference pipeline (:334-338).
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from self_forcing_tpu import conditioning as cond_mod
from tests import reference_loader


def _load_ref_pipeline():
    """Load the reference causal_diffusion_inference module with its
    model-wrapper imports stubbed (the pose CNN builders touch none of
    them)."""
    name = "ref_causal_diffusion_inference"
    if name in sys.modules:
        return sys.modules[name]
    for mod, attrs in {
        "wan": (),
        "wan.modules": (),
        "wan.modules.clip": ("CLIPModel",),
        "wan.utils": (),
        "wan.utils.fm_solvers": (
            "FlowDPMSolverMultistepScheduler", "get_sampling_sigmas",
            "retrieve_timesteps"),
        "wan.utils.fm_solvers_unipc": ("FlowUniPCMultistepScheduler",),
        "utils": (),
        "utils.wan_wrapper": ("WanDiffusionWrapper", "WanTextEncoder",
                              "WanVAEWrapper"),
    }.items():
        if mod not in sys.modules:
            m = types.ModuleType(mod)
            for a in attrs:
                setattr(m, a, type(a, (), {}))
            sys.modules[mod] = m
    return reference_loader.load_ref_module(
        "pipeline/causal_diffusion_inference.py", name)


@pytest.fixture(scope="module")
def ref_pipeline_cls():
    return _load_ref_pipeline().CausalDiffusionInferencePipeline


def _prefixed(sd, prefix):
    return {f"{prefix}{k}": v for k, v in sd.items()}


def test_dwpose_embedding_golden(ref_pipeline_cls):
    torch.manual_seed(0)
    net = ref_pipeline_cls._get_dwpose_embedding(None).eval()
    dw, rr = cond_mod.load_pose_embedding_weights(
        _prefixed(net.state_dict(), "dwpose_embedding."))
    assert rr is None and dw is not None
    assert len(dw["layers"]) == 7

    x = np.random.default_rng(0).standard_normal(
        (1, 3, 9, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    ours = np.asarray(cond_mod.dwpose_embedding(dw, jnp.asarray(x)))
    assert ours.shape == ref.shape == (1, 5120, 3, 2, 2)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_randomref_embedding_golden(ref_pipeline_cls):
    torch.manual_seed(1)
    net = ref_pipeline_cls._get_randomref_embedding_pose(None).eval()
    dw, rr = cond_mod.load_pose_embedding_weights(
        _prefixed(net.state_dict(), "randomref_embedding_pose."))
    assert dw is None and rr is not None
    assert len(rr["layers"]) == 6

    x = np.random.default_rng(1).standard_normal(
        (1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    ours = np.asarray(cond_mod.randomref_embedding(rr, jnp.asarray(x)))
    assert ours.shape == ref.shape == (1, 20, 4, 4)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_prepare_dwpose_input_matches_reference():
    """The reference prepends the first pose frame 3x and scales u8 to
    [0, 1] before the embedding (causal_diffusion_inference.py:334-338):
    81 px frames + 3 -> 84 = 4*21 -> 21 latent frames through the
    temporal strides."""
    rng = np.random.default_rng(2)
    dw_u8 = rng.integers(0, 255, (1, 3, 9, 8, 8), np.uint8)
    t = torch.from_numpy(dw_u8).float()
    ref = torch.cat([t[:, :, :1].repeat(1, 1, 3, 1, 1), t],
                    dim=2) / 255.0
    ours = np.asarray(cond_mod.prepare_dwpose_input(jnp.asarray(dw_u8)))
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-7)
