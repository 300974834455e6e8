"""Discrete-beta diffusion (DDPM/DDIM/PLMS) — pure-functional JAX.

TPU-native re-implementation of the reference DiffusionDDIM
(reference: tools/modules/diffusions/diffusion_ddim.py:28-512). Same math,
different architecture:

  * All sampling loops are ``jax.lax.scan`` bodies — the whole denoising
    trajectory compiles to ONE XLA program with latents HBM-resident,
    instead of a Python loop launching per-step kernels.
  * The model is abstracted as ``model_fn(xt, t) -> out``; classifier-free
    guidance is exposed as pure output math (``classifier_free_guidance``)
    so engines can batch the cond/uncond passes into a single forward
    (batch 2B) — one MXU-friendly call per step instead of two.
  * Video tensors are ``[b, f, h, w, c]`` (NHWC with a leading frame axis),
    the natural TPU layout; the channel axis is -1 everywhere (the
    reference uses NCFHW / axis 1).
  * Randomness is explicit: every stochastic method takes a PRNG key.

Schedule tables are precomputed in float64 on host and stored as float32
device constants, matching the reference's float64 precompute.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import DIFFUSION
from .losses import discretized_gaussian_log_likelihood, kl_divergence
from .schedules import beta_schedule, sigma_schedule

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _i(table: jnp.ndarray, t, ndim: int) -> jnp.ndarray:
    """Index a 1-D schedule table at t, broadcastable against an
    ndim-dimensional batch tensor (reference diffusion_ddim.py:10-16)."""
    v = jnp.asarray(table)[t]
    if v.ndim == 0:
        return v
    return v.reshape(v.shape + (1,) * (ndim - 1))


@DIFFUSION.register_class()
class DiffusionDDIM:
    """Discrete-time diffusion process over a precomputed beta table.

    mean_type in {x0, x_{t-1}, eps, v}; var_type in {learned, learned_range,
    fixed_large, fixed_small}; loss_type in {mse, rescaled_mse, kl,
    rescaled_kl, l1, rescaled_l1, charbonnier}.
    """

    def __init__(self,
                 schedule: str = "linear_sd",
                 schedule_param: Optional[dict] = None,
                 mean_type: str = "eps",
                 var_type: str = "learned_range",
                 loss_type: str = "mse",
                 epsilon: float = 1e-12,
                 rescale_timesteps: bool = False,
                 noise_strength: float = 0.0,
                 **kwargs):
        assert mean_type in ("x0", "x_{t-1}", "eps", "v")
        assert var_type in ("learned", "learned_range", "fixed_large", "fixed_small")
        assert loss_type in ("mse", "rescaled_mse", "kl", "rescaled_kl",
                             "l1", "rescaled_l1", "charbonnier")

        betas = beta_schedule(schedule, **(schedule_param or {}))
        assert betas.min() > 0 and betas.max() <= 1

        self.num_timesteps = len(betas)
        self.mean_type = mean_type
        self.var_type = var_type
        self.loss_type = loss_type
        self.epsilon = epsilon
        self.rescale_timesteps = rescale_timesteps
        self.noise_strength = noise_strength

        # float64 precompute, float32 device tables. Note: with
        # zero_terminal_snr the last alphas_cumprod is exactly 0, so the
        # reciprocal tables end in inf — harmless (the DDIM step sequence
        # tops out at 1 + 20*49 = 981 < 999) and identical to the
        # reference's torch tables; errstate just silences the warning.
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
        alphas_cumprod_next = np.concatenate([alphas_cumprod[1:], [0.0]])

        f32 = partial(jnp.asarray, dtype=jnp.float32)
        self.betas = f32(betas)
        self.alphas_cumprod = f32(alphas_cumprod)
        self.alphas_cumprod_prev = f32(alphas_cumprod_prev)
        self.alphas_cumprod_next = f32(alphas_cumprod_next)

        # q(x_t | x_{t-1})
        self.sqrt_alphas_cumprod = f32(np.sqrt(alphas_cumprod))
        self.sqrt_one_minus_alphas_cumprod = f32(np.sqrt(1.0 - alphas_cumprod))
        self.log_one_minus_alphas_cumprod = f32(np.log(1.0 - alphas_cumprod))
        with np.errstate(divide="ignore"):
            self.sqrt_recip_alphas_cumprod = f32(np.sqrt(1.0 / alphas_cumprod))
            self.sqrt_recipm1_alphas_cumprod = f32(np.sqrt(1.0 / alphas_cumprod - 1.0))

        # q(x_{t-1} | x_t, x_0)
        posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        self.posterior_variance = f32(posterior_variance)
        self.posterior_log_variance_clipped = f32(
            np.log(np.clip(posterior_variance, 1e-20, None)))
        self.posterior_mean_coef1 = f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod))
        self.posterior_mean_coef2 = f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod))

    # ------------------------------------------------------------------ #
    # forward process
    # ------------------------------------------------------------------ #
    def sample_loss_noise(self, key, x0, noise=None):
        """Base noise + optional offset noise shared across h, w
        (reference :81-88). Layout [b, f, h, w, c]: offset is per (b, f, c)."""
        if noise is None:
            k1, k2 = jax.random.split(key)
            noise = jax.random.normal(k1, x0.shape, dtype=jnp.float32)
            if self.noise_strength > 0:
                b, f = x0.shape[0], x0.shape[1]
                c = x0.shape[-1]
                offset = jax.random.normal(k2, (b, f, 1, 1, c), dtype=jnp.float32)
                noise = noise + self.noise_strength * offset
        return noise

    def q_sample(self, x0, t, noise):
        """Sample q(x_t | x_0)."""
        nd = x0.ndim
        return (_i(self.sqrt_alphas_cumprod, t, nd) * x0
                + _i(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise)

    def q_mean_variance(self, x0, t):
        nd = x0.ndim
        mu = _i(self.sqrt_alphas_cumprod, t, nd) * x0
        var = _i(1.0 - self.alphas_cumprod, t, nd)
        log_var = _i(self.log_one_minus_alphas_cumprod, t, nd)
        return mu, var, log_var

    def q_posterior_mean_variance(self, x0, xt, t):
        nd = xt.ndim
        mu = (_i(self.posterior_mean_coef1, t, nd) * x0
              + _i(self.posterior_mean_coef2, t, nd) * xt)
        var = _i(self.posterior_variance, t, nd)
        log_var = _i(self.posterior_log_variance_clipped, t, nd)
        return mu, var, log_var

    # ------------------------------------------------------------------ #
    # guidance (pure output math; engines batch cond/uncond into one pass)
    # ------------------------------------------------------------------ #
    def classifier_free_guidance(self, y_out, u_out, guide_scale):
        """Channel-aware CFG combine (reference :156-162): guidance applies
        to the mean channels only; variance channels come from the
        conditional branch."""
        dim = (y_out.shape[-1] if self.var_type.startswith("fixed")
               else y_out.shape[-1] // 2)
        guided = u_out[..., :dim] + guide_scale * (y_out[..., :dim] - u_out[..., :dim])
        return jnp.concatenate([guided, y_out[..., dim:]], axis=-1)

    # ------------------------------------------------------------------ #
    # reverse process
    # ------------------------------------------------------------------ #
    def _out_to_mean_variance(self, xt, t, out, clamp=None, percentile=None):
        """Model output -> (mu, var, log_var, x0). Pure math half of the
        reference p_mean_variance (reference :147-206)."""
        nd = xt.ndim
        xt = xt.astype(jnp.float32)
        out = out.astype(jnp.float32)

        # variance
        if self.var_type == "learned":
            out, log_var = jnp.split(out, 2, axis=-1)
            var = jnp.exp(log_var)
        elif self.var_type == "learned_range":
            out, fraction = jnp.split(out, 2, axis=-1)
            min_log_var = _i(self.posterior_log_variance_clipped, t, nd)
            max_log_var = _i(jnp.log(self.betas), t, nd)
            fraction = (fraction + 1.0) / 2.0
            log_var = fraction * max_log_var + (1.0 - fraction) * min_log_var
            var = jnp.exp(log_var)
        elif self.var_type == "fixed_large":
            table = jnp.concatenate([self.posterior_variance[1:2], self.betas[1:]])
            var = _i(table, t, nd)
            log_var = jnp.log(var)
        else:  # fixed_small
            var = _i(self.posterior_variance, t, nd)
            log_var = _i(self.posterior_log_variance_clipped, t, nd)

        # mean / x0
        if self.mean_type == "x_{t-1}":
            mu = out
            x0 = (_i(1.0 / self.posterior_mean_coef1, t, nd) * mu
                  - _i(self.posterior_mean_coef2 / self.posterior_mean_coef1, t, nd) * xt)
        elif self.mean_type == "x0":
            x0 = out
        elif self.mean_type == "eps":
            x0 = (_i(self.sqrt_recip_alphas_cumprod, t, nd) * xt
                  - _i(self.sqrt_recipm1_alphas_cumprod, t, nd) * out)
        else:  # v
            x0 = (_i(self.sqrt_alphas_cumprod, t, nd) * xt
                  - _i(self.sqrt_one_minus_alphas_cumprod, t, nd) * out)

        x0 = self._restrict_x0(x0, clamp, percentile)
        if self.mean_type != "x_{t-1}":
            mu, _, _ = self.q_posterior_mean_variance(x0, xt, t)
        return mu, var, log_var, x0

    @staticmethod
    def _restrict_x0(x0, clamp=None, percentile=None):
        """Percentile / clamp x0 range restriction (reference :200-205)."""
        if percentile is not None:
            assert 0 < percentile <= 1
            flat = jnp.abs(x0.reshape(x0.shape[0], -1))
            s = jnp.quantile(flat, percentile, axis=1)
            s = jnp.clip(s, 1.0).reshape((-1,) + (1,) * (x0.ndim - 1))
            x0 = jnp.clip(x0, -s, s) / s
        elif clamp is not None:
            x0 = jnp.clip(x0, -clamp, clamp)
        return x0

    def p_mean_variance(self, xt, t, model_fn: ModelFn, clamp=None,
                        percentile=None):
        out = model_fn(xt, self._scale_timesteps(t))
        return self._out_to_mean_variance(xt, t, out, clamp, percentile)

    def p_sample(self, key, xt, t, model_fn: ModelFn, clamp=None,
                 percentile=None):
        """Ancestral step from p(x_{t-1} | x_t) (reference :115-131)."""
        mu, _, log_var, x0 = self.p_mean_variance(xt, t, model_fn, clamp, percentile)
        noise = jax.random.normal(key, xt.shape, dtype=jnp.float32)
        mask = self._t_mask(t, xt.ndim)
        return mu + mask * jnp.exp(0.5 * log_var) * noise, x0

    @staticmethod
    def _t_mask(t, ndim):
        m = (jnp.asarray(t) != 0).astype(jnp.float32)
        if m.ndim == 0:
            return m
        return m.reshape(m.shape + (1,) * (ndim - 1))

    def p_sample_loop(self, key, noise, model_fn: ModelFn, clamp=None,
                      percentile=None):
        """Full ancestral chain as one lax.scan (reference :133-145)."""
        steps = jnp.arange(self.num_timesteps - 1, -1, -1, dtype=jnp.int32)

        def body(xt, inp):
            step, k = inp
            xt, _ = self.p_sample(k, xt, step, model_fn, clamp, percentile)
            return xt, None

        keys = jax.random.split(key, self.num_timesteps)
        xt, _ = jax.lax.scan(body, noise.astype(jnp.float32), (steps, keys))
        return xt

    # ------------------------------------------------------------------ #
    # DDIM
    # ------------------------------------------------------------------ #
    def ddim_timestep_seq(self, ddim_timesteps: int) -> np.ndarray:
        """The reference's step discretization (reference :250):
        (1 + arange(0, T, T//n)).clip(0, T-1), descending."""
        stride = self.num_timesteps // ddim_timesteps
        steps = 1 + np.arange(0, self.num_timesteps, stride)
        return np.clip(steps, 0, self.num_timesteps - 1)[::-1].copy()

    def ddim_sample(self, key, xt, t, model_fn: ModelFn, clamp=None,
                    percentile=None, ddim_timesteps: int = 20, eta: float = 0.0):
        """One DDIM step (reference :208-244)."""
        stride = self.num_timesteps // ddim_timesteps
        nd = xt.ndim
        _, _, _, x0 = self.p_mean_variance(xt, t, model_fn, clamp, percentile)

        eps = ((_i(self.sqrt_recip_alphas_cumprod, t, nd) * xt - x0)
               / _i(self.sqrt_recipm1_alphas_cumprod, t, nd))
        alphas = _i(self.alphas_cumprod, t, nd)
        alphas_prev = _i(self.alphas_cumprod, jnp.clip(t - stride, 0), nd)
        sigmas = eta * jnp.sqrt((1 - alphas_prev) / (1 - alphas)
                                * (1 - alphas / alphas_prev))

        direction = jnp.sqrt(1 - alphas_prev - sigmas ** 2) * eps
        mask = self._t_mask(t, nd)
        if eta > 0:
            noise = jax.random.normal(key, xt.shape, dtype=jnp.float32)
        else:
            noise = jnp.zeros_like(xt)
        xt_1 = jnp.sqrt(alphas_prev) * x0 + direction + mask * sigmas * noise
        return xt_1, x0

    def ddim_sample_scan(self, key, xt, steps, model_fn: ModelFn, clamp=None,
                         percentile=None, ddim_timesteps: int = 20,
                         eta: float = 0.0):
        """Scan the DDIM update over a GIVEN step array [n]. Used both for
        the full chain and for host-driven SEGMENTS: one device execution
        per segment keeps each XLA program short (at 720p a 100-forward
        program is a single multi-minute device call — too long for
        execution watchdogs; segmenting costs ~ms per boundary)."""
        steps = jnp.asarray(steps, jnp.int32)

        def body(xt, inp):
            step, k = inp
            xt, _ = self.ddim_sample(k, xt, step, model_fn, clamp, percentile,
                                     ddim_timesteps, eta)
            return xt, None

        keys = jax.random.split(key, steps.shape[0])
        xt, _ = jax.lax.scan(body, xt.astype(jnp.float32), (steps, keys))
        return xt

    def ddim_sample_loop(self, key, noise, model_fn: ModelFn, clamp=None,
                         percentile=None, ddim_timesteps: int = 20,
                         eta: float = 0.0):
        """Full DDIM chain as one lax.scan (reference :246-254)."""
        steps = self.ddim_timestep_seq(ddim_timesteps)
        return self.ddim_sample_scan(key, noise, steps, model_fn, clamp,
                                     percentile, ddim_timesteps, eta)

    def ddim_reverse_sample(self, xt, t, model_fn: ModelFn, clamp=None,
                            percentile=None, ddim_timesteps: int = 20):
        """One deterministic DDIM-inversion step (reference :256-274)."""
        stride = self.num_timesteps // ddim_timesteps
        nd = xt.ndim
        _, _, _, x0 = self.p_mean_variance(xt, t, model_fn, clamp, percentile)
        eps = ((_i(self.sqrt_recip_alphas_cumprod, t, nd) * xt - x0)
               / _i(self.sqrt_recipm1_alphas_cumprod, t, nd))
        table = jnp.concatenate([self.alphas_cumprod, jnp.zeros((1,), jnp.float32)])
        alphas_next = _i(table, jnp.clip(t + stride, 0, self.num_timesteps), nd)
        mu = jnp.sqrt(alphas_next) * x0 + jnp.sqrt(1 - alphas_next) * eps
        return mu, x0

    def ddim_reverse_sample_scan(self, xt, steps, model_fn: ModelFn,
                                 clamp=None, percentile=None,
                                 ddim_timesteps: int = 20):
        """Inversion scan over a GIVEN ascending step array [n] (segment
        support, see ddim_sample_scan)."""

        def body(xt, step):
            xt, _ = self.ddim_reverse_sample(xt, step, model_fn, clamp,
                                             percentile, ddim_timesteps)
            return xt, None

        xt, _ = jax.lax.scan(body, xt.astype(jnp.float32),
                             jnp.asarray(steps, jnp.int32))
        return xt

    def ddim_reverse_sample_loop(self, x0, model_fn: ModelFn, clamp=None,
                                 percentile=None, ddim_timesteps: int = 20):
        """x0 -> noise inversion as one lax.scan (reference :276-287)."""
        stride = self.num_timesteps // ddim_timesteps
        steps = np.arange(0, self.num_timesteps, stride, dtype=np.int32)
        return self.ddim_reverse_sample_scan(x0, steps, model_fn, clamp,
                                             percentile, ddim_timesteps)

    # ------------------------------------------------------------------ #
    # PLMS (pseudo linear multistep, Adams-Bashforth orders 2-4)
    # ------------------------------------------------------------------ #
    def plms_sample_loop(self, noise, model_fn: ModelFn, clamp=None,
                         percentile=None, plms_timesteps: int = 20):
        """PLMS chain as one lax.scan with a fixed-size eps ring buffer.

        Reference :289-369. The reference has a latent bug (eps_cache
        missing from the plms_sample signature); this implementation is
        the corrected algorithm: history length min(i, 3), Adams-Bashforth
        weights by order, first step via 2nd-order improved Euler.
        """
        stride = self.num_timesteps // plms_timesteps
        steps = jnp.asarray(self.ddim_timestep_seq(plms_timesteps), dtype=jnp.int32)
        nd = noise.ndim

        def compute_eps(xt, t):
            _, _, _, x0 = self.p_mean_variance(xt, t, model_fn, clamp, percentile)
            return ((_i(self.sqrt_recip_alphas_cumprod, t, nd) * xt - x0)
                    / _i(self.sqrt_recipm1_alphas_cumprod, t, nd))

        def compute_x0(xt, eps, t):
            x0 = (_i(self.sqrt_recip_alphas_cumprod, t, nd) * xt
                  - _i(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps)
            alphas_prev = _i(self.alphas_cumprod, jnp.clip(t - stride, 0), nd)
            direction = jnp.sqrt(1 - alphas_prev) * eps
            return jnp.sqrt(alphas_prev) * x0 + direction

        def body(carry, inp):
            xt, cache = carry  # cache: [3, ...] most-recent-first
            i, t = inp
            eps = compute_eps(xt, t)

            def order1(_):
                # improved Euler: average eps at t and t-stride after a trial step
                xt_1 = compute_x0(xt, eps, t)
                eps_next = compute_eps(xt_1, jnp.clip(t - stride, 0))
                return (eps + eps_next) / 2.0

            def order2(_):
                return (3.0 * eps - cache[0]) / 2.0

            def order3(_):
                return (23.0 * eps - 16.0 * cache[0] + 5.0 * cache[1]) / 12.0

            def order4(_):
                return (55.0 * eps - 59.0 * cache[0] + 37.0 * cache[1]
                        - 9.0 * cache[2]) / 24.0

            order = jnp.minimum(i, 3)
            eps_prime = jax.lax.switch(order, [order1, order2, order3, order4], None)
            xt_1 = compute_x0(xt, eps_prime, t)
            cache = jnp.concatenate([eps[None], cache[:-1]], axis=0)
            return (xt_1, cache), None

        xt0 = noise.astype(jnp.float32)
        cache0 = jnp.zeros((3,) + noise.shape, jnp.float32)
        idx = jnp.arange(len(steps), dtype=jnp.int32)
        (xt, _), _ = jax.lax.scan(body, (xt0, cache0), (idx, steps))
        return xt

    # ------------------------------------------------------------------ #
    # training losses
    # ------------------------------------------------------------------ #
    def loss(self, key, x0, t, model_fn: ModelFn, noise=None, weight=None,
             use_div_loss=False, loss_mask=None):
        """Per-sample training loss [b] (reference :370-452).

        Layout [b, f, h, w, c]; the frame axis for the temporal-divergence
        regularizer is axis 1.
        """
        noise = self.sample_loss_noise(key, x0, noise)
        xt = self.q_sample(x0, t, noise)
        out = model_fn(xt, self._scale_timesteps(t))
        return self._loss_from_out(x0, xt, t, noise, out, weight,
                                   use_div_loss, loss_mask)

    def _loss_from_out(self, x0, xt, t, noise, out, weight=None,
                       use_div_loss=False, loss_mask=None):
        """Loss given a precomputed model output (lets subclasses reuse the
        forward for auxiliary terms, e.g. the reward loss's x0/log-prob —
        the reference returns them from ONE pass, diffusion_ddim.py:677-762)."""
        nd = x0.ndim

        if self.loss_type in ("kl", "rescaled_kl"):
            loss, _ = self._vlb_from_out(x0, xt, t, out)
            if self.loss_type == "rescaled_kl":
                loss = loss * self.num_timesteps
            return loss

        # learned-variance VLB term (variance learned without moving mean)
        loss_vlb = 0.0
        if self.var_type in ("learned", "learned_range"):
            mean_out, var_out = jnp.split(out, 2, axis=-1)
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(mean_out), var_out], axis=-1)
            loss_vlb, _ = self._vlb_from_out(x0, xt, t, frozen)
            if self.loss_type.startswith("rescaled_"):
                loss_vlb = loss_vlb * self.num_timesteps / 1000.0
            out = mean_out

        if self.loss_type == "charbonnier":
            target = {
                "eps": noise,
                "x0": x0,
                "x_{t-1}": self.q_posterior_mean_variance(x0, xt, t)[0],
                "v": (_i(self.sqrt_alphas_cumprod, t, nd) * noise
                      - _i(self.sqrt_one_minus_alphas_cumprod, t, nd) * x0),
            }[self.mean_type]
            loss = jnp.sqrt((out - target) ** 2 + self.epsilon)
            if weight is not None:
                loss = loss * weight
            loss = loss.reshape(loss.shape[0], -1).mean(axis=1)
            return loss + loss_vlb

        target = {
            "eps": noise,
            "x0": x0,
            "x_{t-1}": self.q_posterior_mean_variance(x0, xt, t)[0],
            "v": (_i(self.sqrt_alphas_cumprod, t, nd) * noise
                  - _i(self.sqrt_one_minus_alphas_cumprod, t, nd) * x0),
        }[self.mean_type]

        power = 1 if self.loss_type.endswith("l1") else 2
        if loss_mask is not None:
            # one channel is enough — all channels are identical masks
            m = loss_mask[..., :1]
            err = jnp.abs((out * m - target * m) ** power)
        else:
            err = jnp.abs((out - target) ** power)
        loss = err.reshape(err.shape[0], -1).mean(axis=1)
        if weight is not None:
            loss = loss * weight

        # temporal-divergence regularizer (reference :413-427): reward
        # per-frame variance of the implied x0 to fight static videos.
        if use_div_loss and self.mean_type == "eps" and x0.shape[1] > 1:
            x0_pred = (_i(self.sqrt_recip_alphas_cumprod, t, nd) * xt
                       - _i(self.sqrt_recipm1_alphas_cumprod, t, nd) * out)
            frame_std = x0_pred.std(axis=1)  # std over frames
            div_loss = 0.001 / (frame_std.reshape(frame_std.shape[0], -1).mean(axis=1) + 1e-4)
            loss = loss + div_loss

        return loss + loss_vlb

    def _vlb_from_out(self, x0, xt, t, out, clamp=None, percentile=None):
        mu1, _, log_var1 = self.q_posterior_mean_variance(x0, xt, t)
        mu2, _, log_var2, x0_pred = self._out_to_mean_variance(
            xt, t, out, clamp, percentile)
        kl = kl_divergence(mu1, log_var1, mu2, log_var2)
        kl = kl.reshape(kl.shape[0], -1).mean(axis=1) / math.log(2.0)
        # NLL is evaluated at the PREDICTED x0 (the reference rebinds x0 to
        # the p_mean_variance prediction before the NLL, :459-464)
        nll = -discretized_gaussian_log_likelihood(
            x0_pred, mean=mu2, log_scale=0.5 * log_var2)
        nll = nll.reshape(nll.shape[0], -1).mean(axis=1) / math.log(2.0)
        vlb = jnp.where(jnp.asarray(t) == 0, nll, kl)
        return vlb, x0_pred

    def variational_lower_bound(self, x0, xt, t, model_fn: ModelFn,
                                clamp=None, percentile=None):
        out = model_fn(xt, self._scale_timesteps(t))
        return self._vlb_from_out(x0, xt, t, out, clamp, percentile)

    def variational_lower_bound_loop(self, key, x0, model_fn: ModelFn,
                                     clamp=None, percentile=None):
        """Bits/dim metrics over all T steps as one scan (reference :454-506)."""
        b = x0.shape[0]
        steps = jnp.arange(self.num_timesteps - 1, -1, -1, dtype=jnp.int32)
        keys = jax.random.split(key, self.num_timesteps)
        nd = x0.ndim

        def body(_, inp):
            step, k = inp
            t = jnp.full((b,), step, dtype=jnp.int32)
            noise = self.sample_loss_noise(k, x0)
            xt = self.q_sample(x0, t, noise)
            vlb, pred_x0 = self.variational_lower_bound(
                x0, xt, t, model_fn, clamp, percentile)
            eps = ((_i(self.sqrt_recip_alphas_cumprod, t, nd) * xt - x0)
                   / _i(self.sqrt_recipm1_alphas_cumprod, t, nd))
            x0_mse = ((pred_x0 - x0) ** 2).reshape(b, -1).mean(axis=1)
            mse = ((eps - noise) ** 2).reshape(b, -1).mean(axis=1)
            return None, (vlb, x0_mse, mse)

        _, (vlb, x0_mse, mse) = jax.lax.scan(body, None, (steps, keys))
        metrics = {"vlb": vlb.T, "x0_mse": x0_mse.T, "mse": mse.T}

        t_last = jnp.full((b,), 0, dtype=jnp.int32)
        mu, _, log_var = self.q_mean_variance(x0, t_last)
        kl_prior = kl_divergence(mu, log_var, jnp.zeros_like(mu),
                                 jnp.zeros_like(log_var))
        kl_prior = kl_prior.reshape(b, -1).mean(axis=1) / math.log(2.0)
        metrics["prior_bits_per_dim"] = kl_prior
        metrics["total_bits_per_dim"] = metrics["vlb"].sum(axis=1) + kl_prior
        return metrics

    def _scale_timesteps(self, t):
        if self.rescale_timesteps:
            return jnp.asarray(t, jnp.float32) * 1000.0 / self.num_timesteps
        return t


@DIFFUSION.register_class()
class DiffusionDDIMSR:
    """SDEdit-style SR pair: a reverse (noising) and forward (denoising)
    continuous GaussianDiffusion (reference diffusion_ddim.py:18-25)."""

    def __init__(self, reverse_diffusion, forward_diffusion, **kwargs):
        from .gauss import GaussianDiffusion
        rd, fd = dict(reverse_diffusion), dict(forward_diffusion)
        self.reverse_diffusion = GaussianDiffusion(
            sigmas=sigma_schedule(rd["schedule"], **rd.get("schedule_param", {})),
            prediction_type=rd["mean_type"])
        self.forward_diffusion = GaussianDiffusion(
            sigmas=sigma_schedule(fd["schedule"], **fd.get("schedule_param", {})),
            prediction_type=fd["mean_type"])
