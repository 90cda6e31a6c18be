"""FlowMatchScheduler parity vs the PyTorch reference (utils/scheduler.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from self_forcing_tpu.scheduler import (FlowMatchScheduler, shift_timestep,
                                        warp_denoising_steps)
from tests.reference_loader import load_ref_scheduler


@pytest.fixture(scope="module")
def ref():
    return load_ref_scheduler()


@pytest.fixture(scope="module")
def pair(ref):
    import torch  # noqa
    ref_sched = ref.FlowMatchScheduler(shift=8.0, sigma_min=0.0,
                                       extra_one_step=True)
    ref_sched.set_timesteps(1000, training=True)
    ours = FlowMatchScheduler.create(1000, shift=8.0, training=True)
    return ref_sched, ours


def test_sigma_tables_match(pair):
    ref_sched, ours = pair
    np.testing.assert_allclose(np.asarray(ours.sigmas),
                               ref_sched.sigmas.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.timesteps),
                               ref_sched.timesteps.numpy(), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours.training_weights),
                               ref_sched.linear_timesteps_weights.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_add_noise_matches(pair):
    import torch
    ref_sched, ours = pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 16, 8, 8)).astype(np.float32)
    n = rng.standard_normal((4, 16, 8, 8)).astype(np.float32)
    t = np.array([999.0, 750.0, 500.0, 31.0], np.float32)
    ref_out = ref_sched.add_noise(torch.tensor(x), torch.tensor(n),
                                  torch.tensor(t)).numpy()
    out = np.asarray(ours.add_noise(jnp.asarray(x), jnp.asarray(n),
                                    jnp.asarray(t)))
    np.testing.assert_allclose(out, ref_out, rtol=1e-5, atol=1e-5)


def test_step_matches(pair):
    import torch
    ref_sched, ours = pair
    rng = np.random.default_rng(1)
    v = rng.standard_normal((2, 16, 8, 8)).astype(np.float32)
    x = rng.standard_normal((2, 16, 8, 8)).astype(np.float32)
    t = np.array([999.0, 400.0], np.float32)
    ref_out = ref_sched.step(torch.tensor(v), torch.tensor(t),
                             torch.tensor(x)).numpy()
    out = np.asarray(ours.step(jnp.asarray(v), jnp.asarray(t), jnp.asarray(x)))
    np.testing.assert_allclose(out, ref_out, rtol=1e-5, atol=1e-5)


def test_training_weight_matches(pair):
    import torch
    ref_sched, ours = pair
    t = np.array([999.0, 500.0, 100.0, 10.0], np.float32)
    ref_w = ref_sched.training_weight(torch.tensor(t)).numpy()
    w = np.asarray(ours.training_weight(jnp.asarray(t)))
    np.testing.assert_allclose(w, ref_w, rtol=1e-4, atol=1e-5)


def test_flow_x0_roundtrip():
    ours = FlowMatchScheduler.create(1000, shift=5.0, training=True)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.standard_normal((2, 16, 4, 4)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 16, 4, 4)).astype(np.float32))
    t = jnp.asarray([800.0, 300.0])
    xt = ours.add_noise(x0, eps, t)
    flow = ours.convert_x0_to_flow_pred(x0, xt, t)
    x0_back = ours.convert_flow_pred_to_x0(flow, xt, t)
    np.testing.assert_allclose(np.asarray(x0_back), np.asarray(x0),
                               rtol=1e-4, atol=1e-4)
    # flow target is eps - x0 under the rectified-flow schedule
    np.testing.assert_allclose(np.asarray(flow), np.asarray(eps - x0),
                               rtol=1e-3, atol=1e-3)


def test_timestep_shift_formula():
    t = jnp.asarray([1000.0, 500.0, 250.0])
    out = np.asarray(shift_timestep(t, 5.0))
    expected = 5.0 * (np.array([1.0, 0.5, 0.25])) / (
        1 + 4.0 * np.array([1.0, 0.5, 0.25])) * 1000
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_warp_denoising_steps(pair):
    _, ours = pair
    out = warp_denoising_steps(ours, [1000, 750, 500, 250])
    # timesteps[0] corresponds to sigma_max -> 1000
    assert abs(out[0] - 1000.0) < 1e-3
    assert (np.diff(out) < 0).all()
