"""Golden tests: continuous GaussianDiffusion + dpmpp_2m_sde vs reference.

The reference's torchsde BrownianTree is stubbed to zero noise
(ref_loader), so s_noise=0 runs are exactly comparable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vgen_tpu.diffusion.gauss import GaussianDiffusion, guided_out
from vgen_tpu.diffusion.schedules import sigma_schedule

from .ref_loader import load_ref_gauss, load_ref_schedules

refg = load_ref_gauss()
refs = load_ref_schedules()

B, F, H, W, C = 1, 2, 8, 8, 4
SHAPE_J = (B, F, H, W, C)


def t2j(x):
    return x.permute(0, 2, 3, 4, 1).numpy()


def j2t(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 4, 1, 2, 3).float()


def make_pair(schedule="cosine", prediction_type="v", **sp):
    sig_np = sigma_schedule(schedule, num_timesteps=1000, **sp)
    ours = GaussianDiffusion(sigmas=sig_np, prediction_type=prediction_type)
    theirs = refg.GaussianDiffusion(
        sigmas=refs.sigma_schedule(schedule, num_timesteps=1000, **sp),
        prediction_type=prediction_type)
    return ours, theirs


def jax_model(xt, t):
    t = jnp.asarray(t, jnp.float32).reshape(-1, 1, 1, 1, 1)
    return jnp.tanh(xt) * jnp.cos(0.01 * t)


def torch_model(xt, t=None, **kw):
    tt = t.float().reshape(-1, 1, 1, 1, 1)
    return torch.tanh(xt) * torch.cos(0.01 * tt)


def test_sigma_tables_match():
    ours, theirs = make_pair()
    np.testing.assert_allclose(np.asarray(ours.sigmas), theirs.sigmas.numpy(),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ours.alphas), theirs.alphas.numpy(),
                               rtol=1e-6, atol=1e-7)


def test_diffuse_matches():
    ours, theirs = make_pair()
    rng = np.random.RandomState(0)
    x0 = rng.randn(*SHAPE_J).astype(np.float32)
    noise = rng.randn(*SHAPE_J).astype(np.float32)
    t = np.array([600])
    mine = ours.diffuse(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))
    ref = theirs.diffuse(j2t(x0), torch.from_numpy(t), j2t(noise))
    np.testing.assert_allclose(np.asarray(mine), t2j(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("prediction_type", ["eps", "v", "x0"])
def test_denoise_matches(prediction_type):
    ours, theirs = make_pair(prediction_type=prediction_type)
    rng = np.random.RandomState(1)
    xt = rng.randn(*SHAPE_J).astype(np.float32)
    t = np.array([500])

    mu_j, var_j, logvar_j, x0_j, eps_j = ours.denoise(
        jnp.asarray(xt), jnp.asarray(t), None, jax_model)
    mu_t, var_t, logvar_t, x0_t, eps_t = theirs.denoise(
        j2t(xt), torch.from_numpy(t), None, torch_model)
    np.testing.assert_allclose(np.asarray(mu_j), t2j(mu_t), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(x0_j), t2j(x0_t), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(eps_j), t2j(eps_t), rtol=2e-3, atol=2e-3)


def test_sigma_t_interpolation_matches():
    ours, theirs = make_pair()
    for sigma in (0.01, 0.2, 0.7, 0.95):
        mine = ours.sigma_to_t_np(sigma)
        ref = theirs._sigma_to_t(torch.tensor(sigma)).item()
        assert abs(mine - ref) < 1e-3, sigma
    ts = np.array([10.5, 400.2, 998.9])
    mine = ours.t_to_sigma_np(ts)
    ref = theirs._t_to_sigma(torch.from_numpy(ts)).numpy()
    np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("discretization", ["linspace", "trailing", "leading"])
def test_dpmpp_2m_sde_deterministic_matches(discretization):
    """eta=1, s_noise=0: the reference's stubbed BrownianTree yields zero
    noise, ours multiplies by s_noise=0 — trajectories must agree."""
    ours, theirs = make_pair()
    rng = np.random.RandomState(2)
    noise = rng.randn(*SHAPE_J).astype(np.float32)

    mine = ours.sample(jax.random.PRNGKey(0), jnp.asarray(noise), jax_model,
                       solver="dpmpp_2m_sde", steps=12,
                       discretization=discretization, s_noise=0.0, eta=1.0)
    ref = theirs.sample(j2t(noise), model=torch_model, solver="dpmpp_2m_sde",
                        steps=12, discretization=discretization,
                        s_noise=0.0, eta=1.0, show_progress=False)
    np.testing.assert_allclose(np.asarray(mine), t2j(ref), rtol=5e-3, atol=5e-3)


def test_sr600_style_renoise_then_sample():
    """The SR600 two-pass flow (reverse to level 700, dpmpp denoise) runs
    end-to-end and matches the reference deterministically."""
    ours, theirs = make_pair(schedule="logsnr_cosine_interp",
                             prediction_type="v",
                             scale_min=2.0, scale_max=4.0)
    rng = np.random.RandomState(3)
    x0 = (0.3 * rng.randn(*SHAPE_J)).astype(np.float32)

    mine_xt = ours.ddim_reverse_sample_loop(
        jnp.asarray(x0), jax_model, ddim_timesteps=10, reverse_steps=700)
    ref_xt = theirs.ddim_reverse_sample_loop(
        j2t(x0), model=torch_model, ddim_timesteps=10, reverse_steps=700)
    np.testing.assert_allclose(np.asarray(mine_xt), t2j(ref_xt),
                               rtol=3e-3, atol=3e-3)

    mine = ours.sample(jax.random.PRNGKey(0), mine_xt, jax_model,
                       solver="dpmpp_2m_sde", steps=8, t_max=699,
                       discretization="trailing", s_noise=0.0, eta=1.0)
    ref = theirs.sample(ref_xt, model=torch_model, solver="dpmpp_2m_sde",
                        steps=8, t_max=699, discretization="trailing",
                        s_noise=0.0, eta=1.0, show_progress=False)
    np.testing.assert_allclose(np.asarray(mine), t2j(ref), rtol=5e-3, atol=5e-3)


def test_guided_out_rescale():
    rng = np.random.RandomState(4)
    y = rng.randn(*SHAPE_J).astype(np.float32)
    u = rng.randn(*SHAPE_J).astype(np.float32)
    out = guided_out(jnp.asarray(y), jnp.asarray(u), 9.0, guide_rescale=0.3)
    # replicate reference math (diffusion_gauss.py:208-221)
    exp = u + 9.0 * (y - u)
    ratio = y.reshape(B, -1).std(axis=1, ddof=1) / (exp.reshape(B, -1).std(axis=1, ddof=1) + 1e-12)
    exp = exp * (0.3 * ratio.reshape(-1, 1, 1, 1, 1) + 0.7)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=3e-3, atol=3e-3)


def test_prev_next_step_roundtrip():
    ours, _ = make_pair(prediction_type="v")
    rng = np.random.RandomState(5)
    xt = rng.randn(*SHAPE_J).astype(np.float32)
    t = np.array([500])
    out = jax_model(jnp.asarray(xt), jnp.asarray(t))
    prev = ours.prev_step(out, jnp.asarray(t), jnp.asarray(xt), inference_steps=50)
    assert np.isfinite(np.asarray(prev)).all()
