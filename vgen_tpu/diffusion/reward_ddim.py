"""DiffusionDDIMReward — differentiable partial sampling for reward tuning.

TPU-native re-implementation of the reference subclass
(reference: tools/modules/diffusions/diffusion_ddim.py:515-762), used by
InstructVideo: gradients flow backward THROUGH the last k DDIM steps of
a partial sampling chain into the LoRA parameters.

JAX design: the partial chain is one lax.scan whose body is wrapped in
jax.checkpoint (activation recompute per step, replacing torch
checkpoint :536-545); truncated backprop applies stop_gradient to the
carry for all steps before the cutoff via a gradient-masked select.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import DIFFUSION
from .ddim import DiffusionDDIM, _i

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@DIFFUSION.register_class()
class DiffusionDDIMReward(DiffusionDDIM):
    """DDIM with differentiable partial loops + DDPO-style log-probs."""

    # ------------------------------------------------------------------ #
    def ddim_sample_gradient(self, key, xt, t, model_fn: ModelFn,
                             clamp=None, percentile=None,
                             ddim_timesteps: int = 20, eta: float = 0.0):
        """One differentiable DDIM step (reference :555-591) — same math
        as ddim_sample, gradients intact."""
        return self.ddim_sample(key, xt, t, model_fn, clamp, percentile,
                                ddim_timesteps, eta)

    def ddim_sample_loop_partial(self, key, noise, model_fn: ModelFn,
                                 starting_partial: float,
                                 trunc_backprop_timestep: Optional[int],
                                 ddim_timesteps: int = 20, eta: float = 0.0,
                                 clamp=None, percentile=None):
        """Run the LAST ``starting_partial`` fraction of the DDIM chain,
        differentiably, with truncated backprop before the last
        ``trunc_backprop_timestep`` steps (reference :521-552)."""
        steps_all = self.ddim_timestep_seq(ddim_timesteps)
        starting_step = int(len(steps_all) * starting_partial)
        steps = jnp.asarray(steps_all[-starting_step:], dtype=jnp.int32)
        n = len(steps_all[-starting_step:])
        cutoff = n - (trunc_backprop_timestep or n)  # steps < cutoff: no grad

        idx = jnp.arange(n, dtype=jnp.int32)
        keys = jax.random.split(key, n)

        @jax.checkpoint
        def body(xt, inp):
            i, step, k = inp
            xt_next, _ = self.ddim_sample(k, xt, step, model_fn, clamp,
                                          percentile, ddim_timesteps, eta)
            # truncated backprop: earlier steps contribute no gradient
            xt_next = jax.lax.select(i < cutoff,
                                     jax.lax.stop_gradient(xt_next), xt_next)
            return xt_next, None

        xt, _ = jax.lax.scan(body, noise.astype(jnp.float32),
                             (idx, steps, keys))
        return xt

    # ------------------------------------------------------------------ #
    def ddim_sample_with_logprob(self, key, xt, t, model_fn: ModelFn,
                                 clamp=None, percentile=None,
                                 ddim_timesteps: int = 20, eta: float = 1.0,
                                 prev_sample=None):
        """DDPO-style stochastic DDIM step returning the log-prob of the
        (given or drawn) previous sample under the step's Gaussian
        (reference :595-674)."""
        stride = self.num_timesteps // ddim_timesteps
        nd = xt.ndim
        _, _, _, x0 = self.p_mean_variance(xt, t, model_fn, clamp, percentile)
        eps = ((_i(self.sqrt_recip_alphas_cumprod, t, nd) * xt - x0)
               / _i(self.sqrt_recipm1_alphas_cumprod, t, nd))
        alphas = _i(self.alphas_cumprod, t, nd)
        alphas_prev = _i(self.alphas_cumprod, jnp.clip(t - stride, 0), nd)
        sigmas = eta * jnp.sqrt((1 - alphas_prev) / (1 - alphas)
                                * (1 - alphas / alphas_prev))
        mu = jnp.sqrt(alphas_prev) * x0 \
            + jnp.sqrt(1 - alphas_prev - sigmas ** 2) * eps
        if prev_sample is None:
            z = jax.random.normal(key, xt.shape, jnp.float32)
            # no noise at t==0 (reference mask = t.ne(0), :631)
            mask = (t != 0).astype(jnp.float32).reshape(
                (-1,) + (1,) * (nd - 1))
            prev_sample = mu + mask * sigmas * z
        # log N(prev_sample | mu, sigma^2); the sample is a constant
        # w.r.t. the policy (reference detaches xt_1, :639)
        var = jnp.maximum(sigmas ** 2, 1e-10)
        log_prob = (-((jax.lax.stop_gradient(prev_sample) - mu) ** 2)
                    / (2 * var) - 0.5 * jnp.log(2 * jnp.pi * var))
        log_prob = log_prob.reshape(log_prob.shape[0], -1).mean(axis=1)
        return prev_sample, log_prob, x0

    # ------------------------------------------------------------------ #
    def loss(self, key, x0, t, model_fn: ModelFn, noise=None, weight=None,
             use_div_loss=False, loss_mask=None, return_aux: bool = False):
        """Reward-aware training loss: additionally returns the implied x0
        and a step log-prob from the SAME model forward (the reference
        returns (loss, x0_hat, log_prob) from one pass, :677-762)."""
        noise_ = self.sample_loss_noise(key, x0, noise)
        xt = self.q_sample(x0, t, noise_)
        out = model_fn(xt, self._scale_timesteps(t))
        base = self._loss_from_out(x0, xt, t, noise_, out, weight,
                                   use_div_loss, loss_mask)
        if not return_aux:
            return base
        if self.var_type in ("learned", "learned_range"):
            out = jnp.split(out, 2, axis=-1)[0]
        nd = x0.ndim
        if self.mean_type == "v":
            x0_hat = (_i(self.sqrt_alphas_cumprod, t, nd) * xt
                      - _i(self.sqrt_one_minus_alphas_cumprod, t, nd) * out)
        else:  # eps (the InstructVideo config) and x0 fall-through
            x0_hat = (_i(self.sqrt_recip_alphas_cumprod, t, nd) * xt
                      - _i(self.sqrt_recipm1_alphas_cumprod, t, nd) * out)
        beta_t = _i(self.betas, t, nd)
        if self.mean_type == "eps":
            est_prev = (xt - jnp.sqrt(beta_t) * out) / jnp.sqrt(1 - beta_t)
        else:  # v etc.: derive eps from x0_hat first
            eps = ((_i(self.sqrt_recip_alphas_cumprod, t, nd) * xt - x0_hat)
                   / _i(self.sqrt_recipm1_alphas_cumprod, t, nd))
            est_prev = (xt - jnp.sqrt(beta_t) * eps) / jnp.sqrt(1 - beta_t)
        log_prob = (-0.5 * jnp.log(2 * jnp.pi * beta_t)
                    - (est_prev - xt / jnp.sqrt(1 - beta_t)) ** 2
                    / (2 * beta_t))
        log_prob = log_prob.reshape(log_prob.shape[0], -1).mean(axis=1)
        return base, x0_hat, log_prob


@DIFFUSION.register_class()
class GaussianDiffusionReward(DiffusionDDIMReward):
    """Registered alias kept for config parity (the reference defines an
    unused GaussianDiffusionReward, diffusion_ddim.py:766-810)."""
