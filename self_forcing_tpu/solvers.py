"""Flow-matching multistep ODE solvers (UniPC, DPM-Solver++), TPU-native.

The reference vendors diffusers ports (`wan/utils/fm_solvers_unipc.py`,
`wan/utils/fm_solvers.py`) whose `step()` carries Python-side mutable state
(model-output ring buffer, step counter, per-step linear solves).  On TPU we
exploit that *every* coefficient depends only on the host-known sigma
schedule: the whole solver collapses to per-step linear combinations

    UniPC corrector:   x   <- a_x * last + a_m0 * m1 + a_m1 * m2 + a_mt * x0
    UniPC predictor:   x'  <- b_x * x    + b_m0 * x0 + b_m1 * m1
    DPM++  (midpoint): x'  <- b_x * x    + b_m0 * x0 + b_m1 * m1

with coefficient tables precomputed in float64 numpy at construction.  The
device-side step is two fused multiply-add chains over a tiny state pytree
(two previous x0 predictions + the pre-predictor sample), fully jittable and
scan-able; no per-step recompiles, no host sync.

Semantics match the reference exactly (validated in tests/test_solvers.py
against the vendored schedulers run step-by-step):
- UniPC: solver_order=2, bh2, predict_x0, lower_order_final, corrector on
  every step > 0, final sigma 0 (fm_solvers_unipc.py:77-135,350-640).
- DPM++: dpmsolver++, midpoint, order 2, lower_order_final
  (fm_solvers.py:415-596).
- flow-prediction conversion x0 = x_t - sigma_t * v
  (fm_solvers_unipc.py:315-321).
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


def get_sampling_sigmas(sampling_steps: int, shift: float) -> np.ndarray:
    """Shifted sigma ladder for DPM++ (fm_solvers.py:22-27)."""
    sigma = np.linspace(1, 0, sampling_steps + 1)[:sampling_steps]
    return shift * sigma / (1 + (shift - 1) * sigma)


def _lam(sigma: np.ndarray) -> np.ndarray:
    """lambda = log(alpha) - log(sigma) with alpha = 1 - sigma (flow)."""
    with np.errstate(divide="ignore"):
        return np.log(1.0 - sigma) - np.log(sigma)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SolverState:
    """Device-side multistep state: previous two x0 predictions and (UniPC)
    the sample before the last predictor, for the corrector."""

    m1: jax.Array    # x0 prediction at step i-1
    m2: jax.Array    # x0 prediction at step i-2
    last: jax.Array  # sample fed to the last predictor

    def tree_flatten(self):
        return ((self.m1, self.m2, self.last), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def init_solver_state(shape, dtype=jnp.float32) -> SolverState:
    z = jnp.zeros(shape, dtype)
    return SolverState(m1=z, m2=z, last=z)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class _CoeffSolver:
    """Shared functional interface: coefficient arrays are [N, k] device
    constants; step(i, state, flow_pred, sample) works with traced i.
    Registered pytree so solvers pass through jit boundaries."""

    sigmas: jax.Array        # [N+1] f32 (appended final sigma)
    timesteps: np.ndarray    # [N] host f32 — feed the model t = timesteps[i]
    pred: jax.Array          # [N, 3]  b_x, b_m0, b_m1
    corr: jax.Array          # [N, 4]  a_x, a_m0, a_m1, a_mt (zeros = no-op)
    has_corrector: bool

    def tree_flatten(self):
        return ((self.sigmas, self.pred, self.corr),
                (tuple(self.timesteps.tolist()), self.has_corrector))

    @classmethod
    def tree_unflatten(cls, aux, children):
        sigmas, pred, corr = children
        ts, has_corrector = aux
        return cls(sigmas, np.asarray(ts, np.float32), pred, corr,
                   has_corrector)

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    def convert_to_x0(self, flow_pred: jax.Array, sample: jax.Array,
                      i: jax.Array) -> jax.Array:
        sigma_i = self.sigmas[i]
        return (sample.astype(jnp.float32)
                - sigma_i * flow_pred.astype(jnp.float32))

    def step(self, i, state: SolverState, flow_pred: jax.Array,
             sample: jax.Array):
        """One solver step.  i may be traced (single compiled step for the
        whole schedule).  Returns (new_state, prev_sample)."""
        i = jnp.asarray(i, jnp.int32)
        x0 = self.convert_to_x0(flow_pred, sample, i)
        s = sample.astype(jnp.float32)

        if self.has_corrector:
            a = self.corr[i]
            corrected = (a[0] * state.last.astype(jnp.float32)
                         + a[1] * state.m1.astype(jnp.float32)
                         + a[2] * state.m2.astype(jnp.float32)
                         + a[3] * x0)
            use_c = (i > 0)
            s = jnp.where(use_c, corrected, s)

        b = self.pred[i]
        x_next = (b[0] * s + b[1] * x0
                  + b[2] * state.m1.astype(jnp.float32))
        new_state = SolverState(m1=x0, m2=state.m1, last=s)
        return new_state, x_next.astype(sample.dtype)

    def sample(self, model_fn, noise: jax.Array):
        """Run the full schedule: ``model_fn(x, t_scalar, i) -> flow_pred``.
        Python loop (static schedule); call under jit for one fused program,
        or leave un-jitted to pipeline per-step dispatch."""
        x = noise
        state = init_solver_state(noise.shape, noise.dtype)
        for i, t in enumerate(self.timesteps):
            flow = model_fn(x, float(t), i)
            state, x = self.step(i, state, flow, x)
        return x


def _unipc_coeffs(sigmas: np.ndarray, order: int = 2):
    """Per-step UniPC-bh2 predictor/corrector coefficients
    (fm_solvers_unipc.py:350-640 collapsed to linear combinations)."""
    N = len(sigmas) - 1  # sigmas includes the appended final 0
    lam = _lam(sigmas)
    alpha = 1.0 - sigmas
    pred = np.zeros((N, 3), np.float64)
    corr = np.zeros((N, 4), np.float64)

    def phi_b(hh):
        """(h_phi_1, B_h, b1, b2) for bh2 at signed step hh."""
        h_phi_1 = math.expm1(hh)
        B_h = h_phi_1  # bh2: B(h) = expm1(hh)
        b1 = (h_phi_1 / hh - 1.0) / B_h
        h_phi_2 = h_phi_1 / hh - 1.0
        h_phi_3 = h_phi_2 / hh - 0.5
        b2 = h_phi_3 * 2.0 / B_h
        return h_phi_1, B_h, b1, b2

    lower_order_nums = 0
    prev_order = 0
    for i in range(N):
        # ---- corrector (uses prev_order, sigma_{i} / sigma_{i-1})
        if i > 0:
            h_c = lam[i] - lam[i - 1]
            hh_c = -h_c
            h_phi_1c, B_hc, b1c, b2c = phi_b(hh_c)
            cx = sigmas[i] / sigmas[i - 1]
            cm = -alpha[i] * h_phi_1c
            if prev_order == 1:
                # order 1: x = cx*last + cm*m0 - alpha*B_h*0.5*(mt - m0)
                rho_mt = 0.5
                corr[i] = [cx,
                           cm + alpha[i] * B_hc * rho_mt,
                           0.0,
                           -alpha[i] * B_hc * rho_mt]
            else:
                r0 = (lam[i - 2] - lam[i - 1]) / h_c
                # solve [[1,1],[r0,1]] rho = [b1, b2]
                det = 1.0 - r0
                rho0 = (b1c - b2c) / det
                rho1 = (b2c - r0 * b1c) / det
                # corr_res = rho0 * (m2 - m1)/r0 ; D1_t = mt - m1
                k = -alpha[i] * B_hc
                corr[i] = [cx,
                           cm + k * (-rho0 / r0) + k * (-rho1),
                           k * (rho0 / r0),
                           k * rho1]

        # ---- predictor order for this step
        this_order = min(order, N - i)          # lower_order_final
        this_order = min(this_order, lower_order_nums + 1)
        prev_order = this_order
        if lower_order_nums < order:
            lower_order_nums += 1

        # ---- predictor (sigma_{i+1} / sigma_i)
        if sigmas[i + 1] == 0.0:
            pred[i] = [0.0, 1.0, 0.0]
            continue
        h = lam[i + 1] - lam[i]
        hh = -h
        h_phi_1, B_h, _, _ = phi_b(hh)
        bx = sigmas[i + 1] / sigmas[i]
        bm0 = -alpha[i + 1] * h_phi_1
        bm1 = 0.0
        if this_order == 2:
            r0 = (lam[i - 1] - lam[i]) / h
            # pred_res = 0.5 * (m1 - m0)/r0
            k = -alpha[i + 1] * B_h * 0.5 / r0
            bm0 += -k
            bm1 = k
        pred[i] = [bx, bm0, bm1]
    return pred, corr


def _dpmpp_coeffs(sigmas: np.ndarray, order: int = 2):
    """DPM-Solver++(2M) midpoint coefficients (fm_solvers.py:415-596)."""
    N = len(sigmas) - 1
    lam = _lam(sigmas)
    alpha = 1.0 - sigmas
    pred = np.zeros((N, 3), np.float64)

    lower_order_nums = 0
    for i in range(N):
        this_order = min(order, lower_order_nums + 1)
        # lower_order_final: first order on the final step (final sigma 0)
        if i == N - 1:
            this_order = 1
        if lower_order_nums < order:
            lower_order_nums += 1

        if sigmas[i + 1] == 0.0:
            pred[i] = [0.0, 1.0, 0.0]
            continue
        h = lam[i + 1] - lam[i]
        bx = sigmas[i + 1] / sigmas[i]
        e = math.expm1(-h)          # exp(-h) - 1
        bm0 = -alpha[i + 1] * e
        bm1 = 0.0
        if this_order == 2:
            h0 = lam[i] - lam[i - 1]
            r0 = h0 / h
            # D1 = (m0 - m1)/r0; midpoint adds -0.5*alpha_t*e*D1
            k = -0.5 * alpha[i + 1] * e / r0
            bm0 += k
            bm1 = -k
        pred[i] = [bx, bm0, bm1]
    return pred


def _finalize(sigmas_np: np.ndarray, pred, corr, has_corrector: bool
              ) -> _CoeffSolver:
    # the reference casts timesteps to int64 before feeding the model
    # (fm_solvers_unipc.py:219-221); keep that truncation for parity.
    timesteps = np.floor(sigmas_np[:-1] * 1000.0).astype(np.float32)
    return _CoeffSolver(
        sigmas=jnp.asarray(sigmas_np, jnp.float32),
        timesteps=timesteps,
        pred=jnp.asarray(pred, jnp.float32),
        corr=jnp.asarray(corr, jnp.float32),
        has_corrector=has_corrector)


def flow_unipc(num_inference_steps: int = 50, shift: float = 8.0,
               num_train_timesteps: int = 1000,
               solver_order: int = 2) -> _CoeffSolver:
    """FlowUniPCMultistepScheduler equivalent (set_timesteps with shift,
    final_sigmas_type='zero'; fm_solvers_unipc.py:160-229)."""
    # training schedule: alphas = linspace(1, 1/T, T) -> sigma in
    # [0, 1 - 1/T] (fm_solvers_unipc.py:106-110,130-132)
    sigma_max = 1.0 - 1.0 / num_train_timesteps
    sigma_min = 0.0
    sigmas = np.linspace(sigma_max, sigma_min,
                         num_inference_steps + 1)[:-1]
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    sigmas = np.concatenate([sigmas, [0.0]])
    pred, corr = _unipc_coeffs(sigmas, solver_order)
    return _finalize(sigmas, pred, corr, True)


def flow_dpmpp(num_inference_steps: int = 50, shift: float = 8.0,
               solver_order: int = 2) -> _CoeffSolver:
    """FlowDPMSolverMultistepScheduler equivalent fed by
    get_sampling_sigmas (fm_solvers.py:22-27, final sigma zero)."""
    sigmas = np.concatenate(
        [get_sampling_sigmas(num_inference_steps, shift), [0.0]])
    pred = _dpmpp_coeffs(sigmas, solver_order)
    corr = np.zeros((num_inference_steps, 4), np.float64)
    return _finalize(sigmas, pred, corr, False)


def make_solver(name: str, sampling_steps: int, shift: float) -> _CoeffSolver:
    """'unipc' | 'dpm++' dispatch (bidirectional_diffusion_inference.py:
    88-110)."""
    if name == "unipc":
        return flow_unipc(sampling_steps, shift)
    if name in ("dpm++", "dpmpp", "dpm"):
        return flow_dpmpp(sampling_steps, shift)
    raise NotImplementedError(f"Unsupported solver {name!r}")
