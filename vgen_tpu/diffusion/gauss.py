"""Continuous (sigma-parameterized) Gaussian diffusion + DPM-Solver++ 2M SDE.

TPU-native re-implementation of the reference continuous process
(reference: tools/modules/diffusions/diffusion_gauss.py). Architectural
differences:

  * The solver trajectory (timesteps, sigmas, sigma->t interpolation) is
    precomputed host-side in numpy — it is static per config — so the
    entire SDE solve compiles to ONE lax.scan with no data-dependent
    control flow. The reference re-interpolates sigma->t inside the loop.
  * The torchsde BrownianTree noise source (reference :22-77) is replaced
    by a counter-based sampler over jax.random: the solver only ever
    queries disjoint, consecutive intervals (sigma_i, sigma_{i+1}), whose
    normalized increments are i.i.d. N(0, 1) — so per-step folded PRNG
    keys reproduce the reference's sampling distribution exactly while
    staying scan-compatible and reproducible.
  * Classifier-free guidance + guidance rescale (arXiv:2305.08891) are
    pure output math (``guided_out``) so engines batch cond/uncond.
  * Layout [b, f, h, w, c]; channel axis -1.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import karras_schedule

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _i(table: jnp.ndarray, t, ndim: int) -> jnp.ndarray:
    v = jnp.asarray(table)[t]
    if v.ndim == 0:
        return v
    return v.reshape(v.shape + (1,) * (ndim - 1))


def get_scalings(sigma):
    """Karras preconditioning for VP models (reference :81-84)."""
    c_out = -sigma
    c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
    return c_out, c_in


def guided_out(y_out, u_out, guide_scale, guide_rescale=None):
    """CFG combine + optional std-ratio rescale (reference :196-221)."""
    if guide_scale is None or guide_scale == 1.0:
        return y_out
    out = u_out + guide_scale * (y_out - u_out)
    if guide_rescale is not None:
        assert 0 <= guide_rescale <= 1
        b = y_out.shape[0]
        y_std = y_out.reshape(b, -1).std(axis=1)
        o_std = out.reshape(b, -1).std(axis=1)
        ratio = (y_std / (o_std + 1e-12)).reshape((-1,) + (1,) * (y_out.ndim - 1))
        out = out * (guide_rescale * ratio + (1.0 - guide_rescale))
    return out


class GaussianDiffusion:
    """Continuous diffusion over a sigma table: q(x_t|x_0) = N(a_t x0, s_t^2 I)."""

    def __init__(self, sigmas: np.ndarray, prediction_type: str = "eps"):
        assert prediction_type in ("x0", "eps", "v")
        sigmas = np.asarray(sigmas, dtype=np.float64)
        self.sigmas_np = sigmas
        self.sigmas = jnp.asarray(sigmas, dtype=jnp.float32)
        self.alphas = jnp.asarray(np.sqrt(1.0 - sigmas ** 2), dtype=jnp.float32)
        self.num_timesteps = len(sigmas)
        self.prediction_type = prediction_type

    # ------------------------------------------------------------------ #
    # forward
    # ------------------------------------------------------------------ #
    def diffuse(self, x0, t, noise):
        nd = x0.ndim
        return _i(self.alphas, t, nd) * x0 + _i(self.sigmas, t, nd) * noise

    # ------------------------------------------------------------------ #
    # one-step posterior denoise
    # ------------------------------------------------------------------ #
    def denoise(self, xt, t, s, model_fn: ModelFn, clamp=None, percentile=None):
        """q(x_s | x_t, x0-hat) posterior step (reference :163-247).

        ``model_fn(xt, t) -> out`` must already include guidance (compose
        with ``guided_out``). Returns (mu, var, log_var, x0, eps).
        """
        nd = xt.ndim
        xt = xt.astype(jnp.float32)
        s = t - 1 if s is None else s
        t = jnp.asarray(t)
        s = jnp.asarray(s)

        sigmas = _i(self.sigmas, t, nd)
        alphas = _i(self.alphas, t, nd)
        alphas_s = _i(self.alphas, jnp.clip(s, 0), nd)
        alphas_s = jnp.where(self._bcast(s < 0, nd), 1.0, alphas_s)
        sigmas_s = jnp.sqrt(1.0 - alphas_s ** 2)

        betas = 1.0 - (alphas / alphas_s) ** 2
        coef1 = betas * alphas_s / sigmas ** 2
        coef2 = (alphas * sigmas_s ** 2) / (alphas_s * sigmas ** 2)
        var = betas * (sigmas_s / sigmas) ** 2
        log_var = jnp.clip(jnp.log(var), -20, 20)

        out = model_fn(xt, t).astype(jnp.float32)

        if self.prediction_type == "x0":
            x0 = out
        elif self.prediction_type == "eps":
            x0 = (xt - sigmas * out) / alphas
        else:  # v
            x0 = alphas * xt - sigmas * out

        x0 = self._restrict_x0(x0, clamp, percentile)
        eps = (xt - alphas * x0) / sigmas
        mu = coef1 * x0 + coef2 * xt
        return mu, var, log_var, x0, eps

    @staticmethod
    def _bcast(v, ndim):
        v = jnp.asarray(v)
        if v.ndim == 0:
            return v
        return v.reshape(v.shape + (1,) * (ndim - 1))

    @staticmethod
    def _restrict_x0(x0, clamp=None, percentile=None):
        if percentile is not None:
            assert 0 < percentile <= 1
            flat = jnp.abs(x0.reshape(x0.shape[0], -1))
            s = jnp.clip(jnp.quantile(flat, percentile, axis=1), 1.0)
            s = s.reshape((-1,) + (1,) * (x0.ndim - 1))
            x0 = jnp.clip(x0, -s, s) / s
        elif clamp is not None:
            x0 = jnp.clip(x0, -clamp, clamp)
        return x0

    # ------------------------------------------------------------------ #
    # solver trajectory precompute (host-side, static)
    # ------------------------------------------------------------------ #
    def _log_sigmas_np(self) -> np.ndarray:
        # float32 on purpose: near-terminal sigmas round to exactly 1.0 in
        # float32, giving log-sigma = inf — the reference relies on this to
        # route zero-terminal-SNR tables through the inf-sigma Euler start.
        s = self.sigmas_np.astype(np.float32)
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.log(np.sqrt(s ** 2 / (1.0 - s ** 2)))

    def sigma_to_t_np(self, sigma: float) -> float:
        """Continuous t for a sigma by log-linear interp (reference :436-458)."""
        if np.isinf(sigma):
            return float(len(self.sigmas_np) - 1)
        log_sigmas = self._log_sigmas_np()
        log_sigma = math.log(sigma)
        dists = log_sigma - log_sigmas
        low_idx = int(np.clip((dists >= 0).cumsum().argmax(), 0,
                              len(log_sigmas) - 2))
        high_idx = low_idx + 1
        low, high = log_sigmas[low_idx], log_sigmas[high_idx]
        w = float(np.clip((low - log_sigma) / (low - high), 0, 1))
        return (1 - w) * low_idx + w * high_idx

    def t_to_sigma_np(self, t: np.ndarray) -> np.ndarray:
        """Sigma for continuous t (reference :460-466); inf where undefined."""
        t = np.asarray(t, dtype=np.float64)
        low_idx = np.floor(t).astype(np.int64)
        high_idx = np.ceil(t).astype(np.int64)
        w = t - low_idx
        log_sigmas = self._log_sigmas_np()
        with np.errstate(invalid="ignore"):
            log_sigma = (1 - w) * log_sigmas[low_idx] + w * log_sigmas[high_idx]
        log_sigma = np.where(np.isnan(log_sigma), np.inf, log_sigma)
        return np.exp(log_sigma)

    def solver_trajectory(self, steps: int = 20, t_max=None, t_min=None,
                          discretization: str = "linspace",
                          schedule: Optional[str] = None,
                          discard_penultimate_step: bool = False):
        """Static (sigmas, ts) for the sampling loop (reference :318-363)."""
        steps = int(steps) + (1 if discard_penultimate_step else 0)
        t_max = self.num_timesteps - 1 if t_max is None else t_max
        t_min = 0 if t_min is None else t_min

        if discretization == "leading":
            ts = np.arange(t_min, t_max + 1, (t_max - t_min + 1) / steps)[::-1]
        elif discretization == "linspace":
            ts = np.linspace(t_max, t_min, steps)
        elif discretization == "trailing":
            ts = np.arange(t_max, t_min - 1, -((t_max - t_min + 1) / steps))
        else:
            raise NotImplementedError(discretization)
        ts = np.clip(ts, t_min, t_max).astype(np.float32)

        sigmas = self.t_to_sigma_np(ts)
        sigmas = np.concatenate([sigmas, [0.0]])
        if schedule == "karras":
            finite = sigmas[np.isfinite(sigmas) & (sigmas > 0)]
            if np.isinf(sigmas[0]):
                ks = karras_schedule(n=len(ts) - 1, sigma_min=finite.min(),
                                     sigma_max=finite.max(), rho=7.0)
                sigmas = np.concatenate([[np.inf], ks, [0.0]])
            else:
                ks = karras_schedule(n=len(ts), sigma_min=finite.min(),
                                     sigma_max=sigmas.max(), rho=7.0)
                sigmas = np.concatenate([ks, [0.0]])
        if discard_penultimate_step:
            sigmas = np.concatenate([sigmas[:-2], sigmas[-1:]])
        return sigmas, ts

    # ------------------------------------------------------------------ #
    # sampling
    # ------------------------------------------------------------------ #
    def sample(self, key, noise, model_fn: ModelFn, clamp=None,
               percentile=None, solver: str = "dpmpp_2m_sde", steps: int = 20,
               t_max=None, t_min=None, discretization: Optional[str] = None,
               discard_penultimate_step: Optional[bool] = None,
               eta: float = 1.0, s_noise: float = 1.0,
               solver_type: str = "midpoint", **kwargs):
        """Solver-based sampling (reference sample(), :249-373).

        ``model_fn(xt, t)`` gets integer-rounded table timesteps and must
        include guidance. The solve is a single lax.scan.
        """
        assert solver == "dpmpp_2m_sde", f"unknown solver {solver}"
        schedule = "karras" if "karras" in solver else None
        discretization = discretization or "linspace"
        if discard_penultimate_step is None:
            discard_penultimate_step = True  # dpmpp_2m_sde is in the discard set

        sigmas, _ = self.solver_trajectory(
            steps, t_max, t_min, discretization, schedule,
            discard_penultimate_step)

        # per-sigma integer timesteps for the inner denoise (static)
        t_for_sigma = np.asarray(
            [round(self.sigma_to_t_np(s)) for s in sigmas[:-1]], dtype=np.int32)

        def denoise_to_x0(xt, t_int):
            b = xt.shape[0]
            t = jnp.full((b,), t_int, dtype=jnp.int32)
            return self.denoise(xt, t, None, model_fn, clamp, percentile)[-2]

        return sample_dpmpp_2m_sde(
            key, noise, denoise_to_x0, sigmas, t_for_sigma, eta=eta,
            s_noise=s_noise, solver_type=solver_type)

    # ------------------------------------------------------------------ #
    # DDIM inversion (used by SR600's renoising pass, reference :376-434)
    # ------------------------------------------------------------------ #
    def ddim_reverse_sample(self, xt, t, model_fn: ModelFn, clamp=None,
                            percentile=None, ddim_timesteps: int = 20,
                            reverse_steps: int = 600):
        stride = reverse_steps // ddim_timesteps
        nd = xt.ndim
        _, _, _, x0, eps = self.denoise(xt, t, None, model_fn, clamp, percentile)
        s = jnp.clip(jnp.asarray(t) + stride, 0, reverse_steps - 1)
        alphas_s = _i(self.alphas, jnp.clip(s, 0), nd)
        alphas_s = jnp.where(self._bcast(s < 0, nd), 1.0, alphas_s)
        sigmas_s = jnp.sqrt(1.0 - alphas_s ** 2)
        mu = alphas_s * x0 + sigmas_s * eps
        return mu, x0

    def ddim_reverse_sample_scan(self, xt, steps, model_fn: ModelFn,
                                 clamp=None, percentile=None,
                                 ddim_timesteps: int = 20,
                                 reverse_steps: int = 600):
        """Inversion scan over a GIVEN ascending step array [n] — the
        building block for host-driven segmented execution (one device
        call per segment; see ddim.ddim_sample_scan)."""
        b = xt.shape[0]

        def body(xt, step):
            t = jnp.full((b,), step, dtype=jnp.int32)
            xt, _ = self.ddim_reverse_sample(xt, t, model_fn, clamp,
                                             percentile, ddim_timesteps,
                                             reverse_steps)
            return xt, None

        xt, _ = jax.lax.scan(body, xt.astype(jnp.float32),
                             jnp.asarray(steps, jnp.int32))
        return xt

    def reverse_steps_np(self, ddim_timesteps: int = 20,
                         reverse_steps: int = 600) -> np.ndarray:
        return np.arange(0, reverse_steps, reverse_steps // ddim_timesteps,
                         dtype=np.int32)

    def ddim_reverse_sample_loop(self, x0, model_fn: ModelFn, clamp=None,
                                 percentile=None, ddim_timesteps: int = 20,
                                 reverse_steps: int = 600):
        steps = self.reverse_steps_np(ddim_timesteps, reverse_steps)
        return self.ddim_reverse_sample_scan(x0, steps, model_fn, clamp,
                                             percentile, ddim_timesteps,
                                             reverse_steps)

    # ------------------------------------------------------------------ #
    # single-step helpers (DreamVideo DDIM inversion, reference :468-492)
    # ------------------------------------------------------------------ #
    def prev_step(self, model_out, t, xt, inference_steps: int = 50):
        nd = xt.ndim
        prev_t = jnp.asarray(t) - self.num_timesteps // inference_steps
        sigmas = _i(self.sigmas, t, nd)
        alphas = _i(self.alphas, t, nd)
        alphas_prev = _i(self.alphas, jnp.clip(prev_t, 0), nd)
        alphas_prev = jnp.where(self._bcast(prev_t < 0, nd), 1.0, alphas_prev)
        sigmas_prev = jnp.sqrt(1.0 - alphas_prev ** 2)
        x0 = alphas * xt - sigmas * model_out
        eps = (xt - alphas * x0) / sigmas
        return alphas_prev * x0 + sigmas_prev * eps

    def next_step(self, model_out, t, xt, inference_steps: int = 50):
        nd = xt.ndim
        next_t = jnp.asarray(t)
        t = jnp.minimum(next_t - self.num_timesteps // inference_steps,
                        self.num_timesteps - 1)
        sigmas = _i(self.sigmas, t, nd)
        alphas = _i(self.alphas, t, nd)
        alphas_next = _i(self.alphas, jnp.clip(next_t, 0), nd)
        alphas_next = jnp.where(self._bcast(next_t < 0, nd), 1.0, alphas_next)
        sigmas_next = jnp.sqrt(1.0 - alphas_next ** 2)
        x0 = alphas * xt - sigmas * model_out
        eps = (xt - alphas * x0) / sigmas
        return alphas_next * x0 + sigmas_next * eps


def sample_dpmpp_2m_sde(key, noise, denoise_to_x0, sigmas: np.ndarray,
                        t_for_sigma: np.ndarray, eta: float = 1.0,
                        s_noise: float = 1.0, solver_type: str = "midpoint"):
    """DPM-Solver++ (2M) SDE as one lax.scan (reference :86-142).

    ``sigmas`` is the static host-side trajectory (len N+1, last 0);
    ``t_for_sigma[i]`` the integer model timestep for sigmas[i].
    The Brownian noise increments are i.i.d. per step (see module note).
    """
    assert solver_type in ("heun", "midpoint")
    sigmas = np.asarray(sigmas, dtype=np.float64)
    n = len(sigmas) - 1

    # An 'inf' first sigma (zero-terminal-SNR tables) takes an Euler step
    # from pure noise; handle it in Python — it's a static property.
    start = 0
    x = None
    if np.isinf(sigmas[0]):
        denoised = denoise_to_x0(noise, int(t_for_sigma[0]))
        x = denoised + float(sigmas[1]) * noise
        start = 1
    else:
        x = noise * float(sigmas[0])

    sig_i = jnp.asarray(sigmas[start:n], dtype=jnp.float32)
    sig_ip1 = jnp.asarray(sigmas[start + 1:n + 1], dtype=jnp.float32)
    t_i = jnp.asarray(t_for_sigma[start:n], dtype=jnp.int32)
    num = n - start
    if num <= 0:
        return x
    keys = jax.random.split(key, num)

    carry0 = dpmpp_carry_init(x)
    carry = dpmpp_2m_sde_scan(carry0, sig_i, sig_ip1, t_i, keys,
                              denoise_to_x0, eta, s_noise, solver_type)
    return carry[0]


def dpmpp_carry_init(x):
    """(x, old_denoised, h_last, have_old) scan carry for the SDE solver."""
    x = x.astype(jnp.float32)
    return (x, jnp.zeros_like(x), jnp.asarray(1.0, jnp.float32),
            jnp.asarray(False))


def dpmpp_2m_sde_scan(carry, sig_i, sig_ip1, t_i, keys, denoise_to_x0,
                      eta: float = 1.0, s_noise: float = 1.0,
                      solver_type: str = "midpoint"):
    """Scan the 2M-SDE update over GIVEN sigma/t/key slices, carry in/out.

    Used both by ``sample_dpmpp_2m_sde`` (whole trajectory, one scan) and
    by host-driven SEGMENTED execution at high resolution — one device
    call per slice keeps each XLA execution short (see
    ddim.ddim_sample_scan for the rationale)."""

    def body(carry, inp):
        x, old_denoised, h_last, have_old = carry
        sigma, sigma_next, t_int, k = inp

        _, c_in = get_scalings(sigma)
        b = x.shape[0]
        t = jnp.full((b,), t_int, dtype=jnp.int32)
        denoised = denoise_to_x0(x * c_in, t)

        def final_step(_):
            return denoised

        def sde_step(_):
            t_log = -jnp.log(sigma)
            s_log = -jnp.log(sigma_next)
            h = s_log - t_log
            eta_h = eta * h

            x_new = (sigma_next / sigma * jnp.exp(-eta_h) * x
                     + -jnp.expm1(-h - eta_h) * denoised)

            r = h_last / h
            if solver_type == "heun":
                corr = ((-jnp.expm1(-h - eta_h)) / (-h - eta_h) + 1.0) \
                    * (1.0 / r) * (denoised - old_denoised)
            else:  # midpoint
                corr = 0.5 * -jnp.expm1(-h - eta_h) \
                    * (1.0 / r) * (denoised - old_denoised)
            x_new = x_new + jnp.where(have_old, corr, 0.0)

            z = jax.random.normal(k, x.shape, dtype=jnp.float32)
            x_new = x_new + (z * sigma_next
                             * jnp.sqrt(-jnp.expm1(-2.0 * eta_h)) * s_noise)
            return x_new

        # sigma_next == 0 only at the last step (static trajectory), but we
        # keep it as lax.cond for shape-uniform scanning.
        x_next = jax.lax.cond(sigma_next == 0.0, final_step, sde_step, None)
        t_log = -jnp.log(sigma)
        s_log = -jnp.log(jnp.maximum(sigma_next, 1e-20))
        h_new = s_log - t_log
        return (x_next, denoised, h_new, jnp.asarray(True)), None

    carry, _ = jax.lax.scan(body, carry, (jnp.asarray(sig_i, jnp.float32),
                                          jnp.asarray(sig_ip1, jnp.float32),
                                          jnp.asarray(t_i, jnp.int32), keys))
    return carry
