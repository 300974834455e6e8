"""Golden tests: our numpy schedules vs the reference torch schedules."""

import numpy as np
import pytest

from vgen_tpu.diffusion import schedules as S

from .ref_loader import load_ref_schedules

ref = load_ref_schedules()


@pytest.mark.parametrize("name,kwargs", [
    ("linear", {"init_beta": 0.0001, "last_beta": 0.02}),
    ("linear_sd", {"init_beta": 0.00085, "last_beta": 0.012}),
    ("quadratic", {"init_beta": 0.0015, "last_beta": 0.0195}),
    ("cosine", {"cosine_s": 0.008}),
])
def test_beta_schedules_match_reference(name, kwargs):
    ours = S.beta_schedule(name, num_timesteps=1000, **kwargs)
    theirs = ref.beta_schedule(name, num_timesteps=1000, **kwargs).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-14)


def test_zero_terminal_snr_matches_reference():
    ours = S.beta_schedule("cosine", num_timesteps=1000, cosine_s=0.008,
                           zero_terminal_snr=True)
    theirs = ref.beta_schedule("cosine", num_timesteps=1000, cosine_s=0.008,
                               zero_terminal_snr=True).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)
    # terminal SNR is exactly zero: cumprod(alpha) -> 0
    ab = np.cumprod(1 - ours)
    assert ab[-1] < 1e-12


@pytest.mark.parametrize("name,kwargs", [
    ("cosine", {"cosine_s": 0.008}),
    ("logsnr_cosine_interp", {"scale_min": 2.0, "scale_max": 4.0}),
])
def test_sigma_schedules_match_reference(name, kwargs):
    ours = S.sigma_schedule(name, num_timesteps=1000, **kwargs)
    theirs = ref.sigma_schedule(name, num_timesteps=1000, **kwargs).numpy()
    # reference computes the logsnr path in float32; we use float64
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=1e-6)


def test_karras_matches_reference():
    ours = S.karras_schedule(30, sigma_min=0.002, sigma_max=80.0, rho=7.0)
    theirs = ref.karras_schedule(30, sigma_min=0.002, sigma_max=80.0, rho=7.0).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-8)


def test_conversions_roundtrip():
    betas = S.beta_schedule("linear_sd", num_timesteps=100,
                            init_beta=0.00085, last_beta=0.012)
    sigmas = S.betas_to_sigmas(betas)
    back = S.sigmas_to_betas(sigmas)
    np.testing.assert_allclose(back, betas, rtol=1e-9, atol=1e-12)
    # note the reference's convention mismatch (kept for parity):
    # sigmas_to_logsnrs returns log(sigma^2/alpha^2) while
    # logsnrs_to_sigmas expects log(alpha^2/sigma^2) — inverse under negation
    logsnrs = S.sigmas_to_logsnrs(sigmas)
    np.testing.assert_allclose(S.logsnrs_to_sigmas(-logsnrs), sigmas,
                               rtol=1e-9, atol=1e-12)
