"""Latent Consistency Model machinery: distillation helpers + LCM sampler.

TPU-native re-implementation of the VideoLCM consistency-distillation
helpers (reference: tools/train/train_videolcm_t2v_entrance.py:85-182) and
of the diffusers LCMScheduler 4-step no-CFG inference loop the reference
uses at sampling time (reference: tools/inferences/
inference_videolcm_entrance.py:171-258) — here a lax.scan over a static
timestep table instead of an external scheduler dependency.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def append_dims(x, target_ndim: int):
    if x.ndim > target_ndim:
        raise ValueError(f"input has {x.ndim} dims, target {target_ndim}")
    return x.reshape(x.shape + (1,) * (target_ndim - x.ndim))


def guidance_scale_embedding(w, embedding_dim: int = 512,
                             dtype=jnp.float32) -> jnp.ndarray:
    """Fourier embedding of the guidance scale w (reference :86-112)."""
    w = jnp.asarray(w, dtype=jnp.float32) * 1000.0
    half_dim = embedding_dim // 2
    freq = jnp.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -freq)
    emb = w[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)


def scalings_for_boundary_conditions(timestep, sigma_data: float = 0.5,
                                     timestep_scaling: float = 10.0):
    """Consistency boundary scalings c_skip/c_out (reference :126-129)."""
    scaled = timestep / 0.1
    c_skip = sigma_data ** 2 / (scaled ** 2 + sigma_data ** 2)
    c_out = scaled / jnp.sqrt(scaled ** 2 + sigma_data ** 2)
    return c_skip, c_out


def predicted_origin(model_output, timesteps, sample, prediction_type,
                     alphas, sigmas):
    """eps/v model output -> x0 (reference :133-149)."""
    s = append_dims(jnp.asarray(sigmas)[timesteps], sample.ndim)
    a = append_dims(jnp.asarray(alphas)[timesteps], sample.ndim)
    if prediction_type == "epsilon":
        return (sample - s * model_output) / a
    if prediction_type == "v_prediction":
        return a * sample - s * model_output
    raise ValueError(f"prediction type {prediction_type} not supported")


class DDIMSolver:
    """Precomputed DDIM step table used as the distillation ODE solver
    (reference :158-182)."""

    def __init__(self, alpha_cumprods: np.ndarray, timesteps: int = 1000,
                 ddim_timesteps: int = 50):
        step_ratio = timesteps // ddim_timesteps
        ddim_ts = (np.arange(1, ddim_timesteps + 1) * step_ratio)
        ddim_ts = ddim_ts.round().astype(np.int64) - 1
        self.ddim_timesteps = jnp.asarray(ddim_ts, dtype=jnp.int32)
        self.ddim_alpha_cumprods = jnp.asarray(
            alpha_cumprods[ddim_ts], dtype=jnp.float32)
        self.ddim_alpha_cumprods_prev = jnp.asarray(
            np.concatenate([[alpha_cumprods[0]],
                            alpha_cumprods[ddim_ts[:-1]]]), dtype=jnp.float32)

    def ddim_step(self, pred_x0, pred_noise, timestep_index):
        ac_prev = append_dims(
            self.ddim_alpha_cumprods_prev[timestep_index], pred_x0.ndim)
        dir_xt = jnp.sqrt(1.0 - ac_prev) * pred_noise
        return jnp.sqrt(ac_prev) * pred_x0 + dir_xt


class LCMScheduler:
    """Minimal LCM inference scheduler (diffusers-equivalent semantics).

    Timestep spacing and the consistency update match
    diffusers.LCMScheduler as the reference uses it: trailing spacing over
    ``original_inference_steps`` LCM timesteps, boundary-scaled x0 blend,
    fresh noise between steps except the last.
    """

    def __init__(self, alphas_cumprod: np.ndarray,
                 num_train_timesteps: int = 1000,
                 original_inference_steps: int = 50,
                 prediction_type: str = "epsilon",
                 timestep_scaling: float = 10.0):
        self.alphas_cumprod = np.asarray(alphas_cumprod, dtype=np.float64)
        self.num_train_timesteps = num_train_timesteps
        self.original_inference_steps = original_inference_steps
        self.prediction_type = prediction_type
        self.timestep_scaling = timestep_scaling

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """LCM trailing timestep selection (diffusers set_timesteps)."""
        k = self.num_train_timesteps // self.original_inference_steps
        lcm_origin = np.asarray(
            np.arange(1, self.original_inference_steps + 1) * k) - 1
        skip = self.original_inference_steps // num_inference_steps
        ts = lcm_origin[::-skip][:num_inference_steps]
        return ts.astype(np.int32)

    def sample(self, key, noise, model_fn: ModelFn,
               num_inference_steps: int = 4):
        """4-step (typical) LCM sampling as one lax.scan."""
        ts = self.timesteps(num_inference_steps)
        ac = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)
        alphas = jnp.sqrt(ac)
        sigmas = jnp.sqrt(1.0 - ac)

        n = len(ts)
        keys = jax.random.split(key, n)
        ts_arr = jnp.asarray(ts, dtype=jnp.int32)
        # renoise target: the next (lower) timestep; last step emits x0
        prev_ts = jnp.asarray(np.concatenate([ts[1:], [0]]), dtype=jnp.int32)
        is_last = jnp.arange(n) == n - 1

        def body(x, inp):
            t, t_prev, k, last = inp
            b = x.shape[0]
            tb = jnp.full((b,), t, dtype=jnp.int32)
            out = model_fn(x, tb).astype(jnp.float32)
            pred = "epsilon" if self.prediction_type == "epsilon" else "v_prediction"
            x0 = predicted_origin(out, tb, x, pred, alphas, sigmas)
            # raw integer timestep: scalings divide by 0.1, i.e. scaled =
            # 10*t — matching diffusers LCMScheduler (timestep_scaling=10)
            # and train_videolcm's scalings_for_boundary_conditions
            c_skip, c_out = scalings_for_boundary_conditions(
                jnp.asarray(t, jnp.float32))
            denoised = c_out * x0 + c_skip * x
            z = jax.random.normal(k, x.shape, dtype=jnp.float32)
            a_prev = jnp.sqrt(ac[t_prev])
            s_prev = jnp.sqrt(1.0 - ac[t_prev])
            x_next = jnp.where(last, denoised, a_prev * denoised + s_prev * z)
            return x_next, None

        x, _ = jax.lax.scan(body, noise.astype(jnp.float32),
                            (ts_arr, prev_ts, keys, is_last))
        return x
