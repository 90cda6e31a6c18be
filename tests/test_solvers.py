"""Golden tests: TPU coefficient solvers vs. the reference fm_solvers.

The reference schedulers (wan/utils/fm_solvers_unipc.py, fm_solvers.py) are
run step-by-step on torch CPU as numerical oracles against our
host-precomputed-coefficient solvers, with a deterministic synthetic "model"
so trajectories exercise the multistep buffers."""
import numpy as np
import jax.numpy as jnp
import pytest

from self_forcing_tpu.solvers import (flow_unipc, flow_dpmpp, make_solver,
                                      init_solver_state, get_sampling_sigmas)
from tests.reference_loader import load_ref_fm_solvers


def _fake_flow_np(x, t):
    """Deterministic pseudo-model: flow depends on x and t."""
    return 0.3 * x + 0.05 * np.sin(0.01 * t + np.arange(x.size)
                                   .reshape(x.shape) * 0.1)


@pytest.mark.parametrize("steps,shift", [(10, 8.0), (7, 3.0)])
def test_unipc_matches_reference(steps, shift):
    import torch
    ref_unipc_mod, _ = load_ref_fm_solvers()

    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(1, 2, 4, 4)).astype(np.float32)

    # ---- reference trajectory
    ref = ref_unipc_mod.FlowUniPCMultistepScheduler(
        num_train_timesteps=1000, shift=1, use_dynamic_shifting=False)
    ref.set_timesteps(steps, shift=shift)
    x_ref = torch.from_numpy(x0.copy())
    for t in ref.timesteps:
        flow = torch.from_numpy(
            _fake_flow_np(x_ref.numpy(), float(t)).astype(np.float32))
        x_ref = ref.step(flow, t, x_ref, return_dict=False)[0]

    # ---- ours
    solver = flow_unipc(steps, shift=shift)
    np.testing.assert_allclose(
        solver.timesteps, ref.timesteps.numpy().astype(np.float32), atol=1e-3)
    x = jnp.asarray(x0)
    state = init_solver_state(x.shape, x.dtype)
    for i, t in enumerate(solver.timesteps):
        flow = jnp.asarray(_fake_flow_np(np.asarray(x), float(t))
                           .astype(np.float32))
        state, x = solver.step(i, state, flow, x)

    np.testing.assert_allclose(np.asarray(x), x_ref.numpy(),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("steps,shift", [(10, 8.0), (6, 5.0)])
def test_dpmpp_matches_reference(steps, shift):
    import torch
    _, ref_dpm_mod = load_ref_fm_solvers()

    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(1, 2, 4, 4)).astype(np.float32)

    ref = ref_dpm_mod.FlowDPMSolverMultistepScheduler(
        num_train_timesteps=1000, shift=1, use_dynamic_shifting=False)
    sigmas = get_sampling_sigmas(steps, shift)
    ref.set_timesteps(sigmas=sigmas)
    x_ref = torch.from_numpy(x0.copy())
    for t in ref.timesteps:
        flow = torch.from_numpy(
            _fake_flow_np(x_ref.numpy(), float(t)).astype(np.float32))
        x_ref = ref.step(flow, t, x_ref, return_dict=False)[0]

    solver = flow_dpmpp(steps, shift=shift)
    x = jnp.asarray(x0)
    state = init_solver_state(x.shape, x.dtype)
    for i, t in enumerate(solver.timesteps):
        flow = jnp.asarray(_fake_flow_np(np.asarray(x), float(t))
                           .astype(np.float32))
        state, x = solver.step(i, state, flow, x)

    np.testing.assert_allclose(np.asarray(x), x_ref.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_make_solver_dispatch():
    assert make_solver("unipc", 4, 8.0).num_steps == 4
    assert make_solver("dpm++", 4, 8.0).num_steps == 4
    with pytest.raises(NotImplementedError):
        make_solver("euler", 4, 8.0)
