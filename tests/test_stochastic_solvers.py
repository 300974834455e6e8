"""Noise-oracle validation of the STOCHASTIC solver paths (VERDICT #9).

The deterministic (eta=0 / zero-noise) paths are golden-tested in
test_ddim.py / test_gauss.py. Here the random draws themselves are made
comparable: we record the exact standard-normal stream our JAX solvers
will consume (jax.random.split + normal per step) and inject the same
stream into the torch reference (monkeypatched torch.randn_like /
BrownianTreeNoiseSampler), so eta>0 DDIM (reference
diffusion_ddim.py:208-244) and the SDE branch of dpmpp_2m_sde
(diffusion_gauss.py:86-142) are compared end-to-end including their
noise-scaling algebra.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vgen_tpu.diffusion.ddim import DiffusionDDIM
from vgen_tpu.diffusion.gauss import sample_dpmpp_2m_sde

from .ref_loader import load_ref_ddim, load_ref_gauss

B, F, H, W, C = 2, 4, 8, 8, 4
SHAPE_J = (B, F, H, W, C)

SCHED = dict(schedule="cosine",
             schedule_param={"num_timesteps": 50, "cosine_s": 0.008,
                             "zero_terminal_snr": False},
             mean_type="v", var_type="fixed_small", loss_type="mse",
             noise_strength=0.0)


def t2j(x: torch.Tensor) -> np.ndarray:
    return x.permute(0, 2, 3, 4, 1).numpy()


def j2t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x)).permute(0, 4, 1, 2, 3).float()


def jax_model(xt, t):
    t = jnp.asarray(t, jnp.float32)
    if t.ndim == 0:
        t = jnp.full((xt.shape[0],), t)
    t = t.reshape(-1, 1, 1, 1, 1)
    return jnp.sin(xt) * jnp.cos(0.05 * t) + 0.1 * xt


def torch_model(xt, t, **kw):
    tt = torch.as_tensor(t).float().reshape(-1, 1, 1, 1, 1)
    return torch.sin(xt) * torch.cos(0.05 * tt) + 0.1 * xt


def test_ddim_eta_noise_oracle(monkeypatch):
    """Full 10-step DDIM chain at eta=0.8: per-step noise recorded from
    the JAX side and injected into the reference loop."""
    refmod = load_ref_ddim()
    ours = DiffusionDDIM(**SCHED)
    theirs = refmod.DiffusionDDIM(**SCHED)

    ddim_steps = 10
    eta = 0.8
    key = jax.random.PRNGKey(42)
    rng = np.random.RandomState(0)
    noise0 = rng.randn(*SHAPE_J).astype(np.float32)

    # the exact stream ddim_sample_scan consumes: split(key, n) -> normal
    steps = ours.ddim_timestep_seq(ddim_steps)
    keys = jax.random.split(key, len(steps))
    zs = [np.asarray(jax.random.normal(k, SHAPE_J, dtype=jnp.float32))
          for k in keys]

    out_j = ours.ddim_sample_loop(key, jnp.asarray(noise0), jax_model,
                                  ddim_timesteps=ddim_steps, eta=eta)

    it = iter(zs)
    monkeypatch.setattr(torch, "randn_like", lambda x: j2t(next(it)))
    with torch.no_grad():
        out_t = theirs.ddim_sample_loop(
            j2t(noise0), torch_model, ddim_timesteps=ddim_steps, eta=eta)

    np.testing.assert_allclose(np.asarray(out_j), t2j(out_t),
                               rtol=2e-4, atol=2e-4)


def test_ddim_eta_sigma_formula():
    """Single eta>0 step: the sigma_t (per-step std) must match the
    reference closed form eta*sqrt((1-a_prev)/(1-a)*(1-a/a_prev))."""
    ours = DiffusionDDIM(**SCHED)
    ddim_steps = 10
    stride = ours.num_timesteps // ddim_steps
    eta = 0.7
    rng = np.random.RandomState(1)
    xt = jnp.asarray(rng.randn(*SHAPE_J).astype(np.float32))
    t = jnp.full((B,), 31, jnp.int32)
    key = jax.random.PRNGKey(5)

    out_det, x0 = ours.ddim_sample(key, xt, t, jax_model,
                                   ddim_timesteps=ddim_steps, eta=0.0)
    out_sto, _ = ours.ddim_sample(key, xt, t, jax_model,
                                  ddim_timesteps=ddim_steps, eta=eta)

    a = np.asarray(ours.alphas_cumprod)[31]
    a_prev = np.asarray(ours.alphas_cumprod)[31 - stride]
    sigma = eta * np.sqrt((1 - a_prev) / (1 - a) * (1 - a / a_prev))
    z = np.asarray(jax.random.normal(key, SHAPE_J, dtype=jnp.float32))

    # deterministic parts differ too (direction uses sqrt(1-a_prev-s^2));
    # reconstruct the stochastic output from the deterministic one
    eps = ((np.asarray(ours.sqrt_recip_alphas_cumprod)[31] * np.asarray(xt)
            - np.asarray(x0))
           / np.asarray(ours.sqrt_recipm1_alphas_cumprod)[31])
    expect = (np.asarray(out_det)
              + (np.sqrt(1 - a_prev - sigma ** 2) - np.sqrt(1 - a_prev)) * eps
              + sigma * z)
    np.testing.assert_allclose(np.asarray(out_sto), expect,
                               rtol=2e-4, atol=2e-4)


def test_dpmpp_2m_sde_noise_oracle():
    """dpmpp_2m_sde with eta=1 (the SDE branch): identical Brownian
    stream injected into the reference via BrownianTreeNoiseSampler."""
    refmod = load_ref_gauss()

    n = 12
    # karras-ish descending trajectory ending at 0, no inf head
    sigmas = np.concatenate([
        np.geomspace(14.6, 0.03, n).astype(np.float64), [0.0]])
    t_for_sigma = np.linspace(980, 20, n).astype(np.int64)

    rng = np.random.RandomState(3)
    noise0 = rng.randn(*SHAPE_J).astype(np.float32)
    key = jax.random.PRNGKey(9)

    # the reference model receives sigma, ours an integer timestep —
    # use time-independent denoisers so the streams stay comparable
    def jmodel(x, t):
        return jnp.sin(x) + 0.1 * x

    def tmodel(x, t, **kw):
        return torch.sin(x) + 0.1 * x

    # record the stream sample_dpmpp_2m_sde consumes (start=0, num=n)
    keys = jax.random.split(key, n)
    zs = [np.asarray(jax.random.normal(k, SHAPE_J, dtype=jnp.float32))
          for k in keys]

    for solver_type in ("midpoint", "heun"):
        out_j = sample_dpmpp_2m_sde(
            key, jnp.asarray(noise0), jmodel,
            sigmas, t_for_sigma, eta=1.0, s_noise=1.0,
            solver_type=solver_type)

        consumed = []

        class _Injector:
            def __init__(self, x, smin, smax):
                pass

            def __call__(self, s0, s1):
                # reference calls the sampler once per non-final step, in
                # step order — same order our scan consumes keys
                z = j2t(zs[len(consumed)])
                consumed.append(float(s0))
                return z

        orig = refmod.BrownianTreeNoiseSampler
        refmod.BrownianTreeNoiseSampler = _Injector
        try:
            with torch.no_grad():
                out_t = refmod.sample_dpmpp_2m_sde(
                    j2t(noise0), tmodel,
                    torch.tensor(sigmas, dtype=torch.float32),
                    eta=1.0, s_noise=1.0, solver_type=solver_type,
                    show_progress=False)
        finally:
            refmod.BrownianTreeNoiseSampler = orig

        # reference skips the sampler on the final (sigma=0) step
        assert len(consumed) == n - 1
        np.testing.assert_allclose(
            np.asarray(out_j), t2j(out_t), rtol=3e-4, atol=3e-4,
            err_msg=f"dpmpp_2m_sde eta=1 mismatch ({solver_type})")
