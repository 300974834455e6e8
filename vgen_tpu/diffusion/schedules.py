"""Noise schedules (beta / sigma / logsnr / karras) and conversions.

TPU-native re-implementation of the reference schedule zoo
(reference: tools/modules/diffusions/schedules.py:5-165). Schedules are
precomputed host-side in numpy float64 — exactly like the reference's
torch.float64 tables — and converted to on-device jnp arrays by the
diffusion processes that consume them. Keeping this layer in numpy keeps
it trivially testable against closed forms and independent of jax tracing.
"""

from __future__ import annotations

import math

import numpy as np


# --------------------------------------------------------------------------- #
# beta schedules
# --------------------------------------------------------------------------- #
def linear_schedule(num_timesteps: int, init_beta: float = None,
                    last_beta: float = None, **kwargs) -> np.ndarray:
    """Linear betas, scaled for the step count (reference :46-50)."""
    scale = 1000.0 / num_timesteps
    init_beta = init_beta or scale * 0.0001
    last_beta = last_beta or scale * 0.02
    return np.linspace(init_beta, last_beta, num_timesteps, dtype=np.float64)


def linear_sd_schedule(num_timesteps: int, init_beta: float,
                       last_beta: float, **kwargs) -> np.ndarray:
    """Stable-diffusion 'scaled linear' betas (reference :62-63)."""
    return np.linspace(init_beta ** 0.5, last_beta ** 0.5, num_timesteps,
                       dtype=np.float64) ** 2


def quadratic_schedule(num_timesteps: int, init_beta: float = None,
                       last_beta: float = None, **kwargs) -> np.ndarray:
    init_beta = init_beta or 0.0015
    last_beta = last_beta or 0.0195
    return np.linspace(init_beta ** 0.5, last_beta ** 0.5, num_timesteps,
                       dtype=np.float64) ** 2


def cosine_schedule(num_timesteps: int, cosine_s: float = 0.008,
                    **kwargs) -> np.ndarray:
    """Improved-DDPM cosine betas, clipped at 0.999 (reference :72-79)."""
    steps = np.arange(num_timesteps, dtype=np.float64)
    t1 = steps / num_timesteps
    t2 = (steps + 1) / num_timesteps

    def f(u):
        return np.cos((u + cosine_s) / (1 + cosine_s) * math.pi / 2) ** 2

    betas = 1.0 - f(t2) / f(t1)
    return np.minimum(betas, 0.999)


_BETA_SCHEDULES = {
    "linear": linear_schedule,
    "linear_sd": linear_sd_schedule,
    "quadratic": quadratic_schedule,
    "cosine": cosine_schedule,
}


def beta_schedule(schedule: str = "cosine", num_timesteps: int = 1000,
                  zero_terminal_snr: bool = False, **kwargs) -> np.ndarray:
    """Dispatch + optional zero-terminal-SNR rescale (reference :5-21)."""
    betas = _BETA_SCHEDULES[schedule](num_timesteps=num_timesteps, **kwargs)
    if zero_terminal_snr and abs(betas.max() - 1.0) > 1e-4:
        betas = rescale_zero_terminal_snr(betas)
    return betas


# --------------------------------------------------------------------------- #
# sigma schedules (continuous / GaussianDiffusion parameterization)
# --------------------------------------------------------------------------- #
def betas_to_sigmas(betas: np.ndarray) -> np.ndarray:
    return np.sqrt(1.0 - np.cumprod(1.0 - betas))


def sigmas_to_betas(sigmas: np.ndarray) -> np.ndarray:
    square_alphas = 1.0 - sigmas ** 2
    return 1.0 - np.concatenate(
        [square_alphas[:1], square_alphas[1:] / square_alphas[:-1]])


def sigmas_to_logsnrs(sigmas: np.ndarray) -> np.ndarray:
    s2 = sigmas ** 2
    return np.log(s2 / (1.0 - s2))


def logsnrs_to_sigmas(logsnrs: np.ndarray) -> np.ndarray:
    # sigma = sqrt(sigmoid(-logsnr))
    return np.sqrt(1.0 / (1.0 + np.exp(logsnrs)))


def _logsnr_cosine(n: int, logsnr_min: float = -15.0,
                   logsnr_max: float = 15.0) -> np.ndarray:
    t_min = math.atan(math.exp(-0.5 * logsnr_min))
    t_max = math.atan(math.exp(-0.5 * logsnr_max))
    t = np.linspace(1, 0, n, dtype=np.float64)
    return -2.0 * np.log(np.tan(t_min + t * (t_max - t_min)))


def _logsnr_cosine_shifted(n: int, logsnr_min: float = -15.0,
                           logsnr_max: float = 15.0,
                           scale: float = 2.0) -> np.ndarray:
    return _logsnr_cosine(n, logsnr_min, logsnr_max) + 2.0 * math.log(1.0 / scale)


def _logsnr_cosine_interp(n: int, logsnr_min: float = -15.0,
                          logsnr_max: float = 15.0, scale_min: float = 2.0,
                          scale_max: float = 4.0) -> np.ndarray:
    """Interpolated shifted-cosine logsnr (reference :131-140)."""
    t = np.linspace(1, 0, n, dtype=np.float64)
    lo = _logsnr_cosine_shifted(n, logsnr_min, logsnr_max, scale_min)
    hi = _logsnr_cosine_shifted(n, logsnr_min, logsnr_max, scale_max)
    return t * lo + (1 - t) * hi


def logsnr_cosine_interp_schedule(num_timesteps: int, scale_min: float = 2.0,
                                  scale_max: float = 4.0,
                                  logsnr_min: float = -15.0,
                                  logsnr_max: float = 15.0,
                                  **kwargs) -> np.ndarray:
    return logsnrs_to_sigmas(_logsnr_cosine_interp(
        num_timesteps, logsnr_min, logsnr_max, scale_min, scale_max))


def sigma_schedule(schedule: str = "cosine", num_timesteps: int = 1000,
                   zero_terminal_snr: bool = False, **kwargs) -> np.ndarray:
    """Sigma table: direct for logsnr_cosine_interp, else betas→sigmas
    (reference :24-43)."""
    if schedule == "logsnr_cosine_interp":
        sigmas = logsnr_cosine_interp_schedule(num_timesteps=num_timesteps, **kwargs)
    else:
        sigmas = betas_to_sigmas(
            _BETA_SCHEDULES[schedule](num_timesteps=num_timesteps, **kwargs))
    if zero_terminal_snr and abs(sigmas.max() - 1.0) > 1e-4:
        sigmas = rescale_zero_terminal_snr(sigmas)
    return sigmas


def karras_schedule(n: int, sigma_min: float = 0.002, sigma_max: float = 80.0,
                    rho: float = 7.0) -> np.ndarray:
    """Karras et al. sigma spacing, mapped into VP sigma space
    (reference :119-125)."""
    ramp = np.linspace(1, 0, n, dtype=np.float64)
    min_inv_rho = sigma_min ** (1.0 / rho)
    max_inv_rho = sigma_max ** (1.0 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return np.sqrt(sigmas ** 2 / (1.0 + sigmas ** 2))


def rescale_zero_terminal_snr(betas_or_sigmas: np.ndarray) -> np.ndarray:
    """Zero-terminal-SNR rescale (arXiv:2305.08891; reference :143-165).

    Operates on a beta table: shifts sqrt(alpha_bar) so the final step has
    exactly zero SNR, rescales so the first step is unchanged, converts back.
    (The reference applies the same function to sigma tables when invoked
    from sigma_schedule; this matches by operating on the input as betas.)
    """
    betas = betas_or_sigmas
    alphas = 1.0 - betas
    alphas_bar = np.cumprod(alphas)
    sqrt_ab = np.sqrt(alphas_bar)

    sqrt_ab_0 = sqrt_ab[0].copy()
    sqrt_ab_T = sqrt_ab[-1].copy()
    sqrt_ab = sqrt_ab - sqrt_ab_T
    sqrt_ab = sqrt_ab * sqrt_ab_0 / (sqrt_ab_0 - sqrt_ab_T)

    alphas_bar = sqrt_ab ** 2
    alphas = np.concatenate([alphas_bar[0:1], alphas_bar[1:] / alphas_bar[:-1]])
    return 1.0 - alphas
