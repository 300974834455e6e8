"""Reward diffusion: DDPO log-prob golden test vs the torch reference +
single-forward reward loss + RWR/DDPO engine smoke runs.

Reference oracle: tools/modules/diffusions/diffusion_ddim.py:595-674
(ddim_sample_with_logprob) and :677-762 (reward loss single pass).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import yaml

from vgen_tpu.diffusion.reward_ddim import DiffusionDDIMReward

from .ref_loader import load_ref_ddim
import pytest

refmod = load_ref_ddim()

SCHED = dict(schedule="linear_sd",
             schedule_param={"num_timesteps": 64, "init_beta": 0.00085,
                             "last_beta": 0.012},
             mean_type="eps", var_type="fixed_small", loss_type="mse",
             noise_strength=0.0)

B, F, H, W, C = 2, 4, 8, 8, 4


def t2j(x):
    return x.permute(0, 2, 3, 4, 1).numpy()


def j2t(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 4, 1, 2, 3).float()


def jax_model(xt, t):
    t = jnp.asarray(t, jnp.float32)
    if t.ndim == 0:
        t = jnp.full((xt.shape[0],), t)
    t = t.reshape(-1, 1, 1, 1, 1)
    return jnp.sin(xt) * jnp.cos(0.05 * t) + 0.1 * xt


def torch_model(xt, t, **kw):
    tt = t.float().reshape(-1, 1, 1, 1, 1)
    return torch.sin(xt) * torch.cos(0.05 * tt) + 0.1 * xt


def test_logprob_step_matches_reference():
    """ddim_sample_with_logprob with a GIVEN prev_sample: x0 and log_prob
    must match the reference formulas (diffusion_ddim.py:595-674)."""
    ours = DiffusionDDIMReward(**SCHED)
    theirs = refmod.DiffusionDDIMReward(**SCHED)

    rng = np.random.RandomState(0)
    xt = rng.randn(B, F, H, W, C).astype(np.float32)
    prev = rng.randn(B, F, H, W, C).astype(np.float32)
    for tval in (1, 17, 33):
        t_j = jnp.full((B,), tval, jnp.int32)
        t_t = torch.full((B,), tval, dtype=torch.long)
        p_j, lp_j, x0_j = ours.ddim_sample_with_logprob(
            jax.random.PRNGKey(0), jnp.asarray(xt), t_j, jax_model,
            ddim_timesteps=8, eta=1.0, prev_sample=jnp.asarray(prev))
        with torch.no_grad():
            p_t, x0_t, lp_t = theirs.ddim_sample_with_logprob(
                j2t(xt), t_t, torch_model, ddim_timesteps=8, eta=1.0,
                prev_sample=j2t(prev))
        np.testing.assert_allclose(np.asarray(x0_j), t2j(x0_t),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(lp_j), lp_t.numpy(),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(p_j), t2j(p_t), rtol=1e-6)


def test_reward_loss_single_forward_and_consistent():
    """loss(return_aux=True) must (a) run ONE model forward and (b) return
    the same base loss as return_aux=False (the reference computes loss,
    x0_hat, log_prob in one pass, :677-762)."""
    ours = DiffusionDDIMReward(**SCHED)
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, (B, F, H, W, C))
    t = jnp.asarray([5, 40])

    calls = {"n": 0}

    def counting_model(xt, tt):
        calls["n"] += 1
        return jax_model(xt, tt)

    base = ours.loss(key, x0, t, counting_model)
    n_plain = calls["n"]
    calls["n"] = 0
    loss, x0_hat, log_prob = ours.loss(key, x0, t, counting_model,
                                       return_aux=True)
    assert calls["n"] == n_plain == 1, "aux path must not re-run the model"
    np.testing.assert_array_equal(np.asarray(base), np.asarray(loss))
    assert x0_hat.shape == x0.shape
    assert log_prob.shape == (B,)
    assert np.isfinite(np.asarray(x0_hat)).all()
    assert np.isfinite(np.asarray(log_prob)).all()


def _iv_cfg(tmp_path, **over):
    with open("configs/tiny/instructvideo_train.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg.update({"num_steps": 1, "log_dir": str(tmp_path),
                "save_ckp_interval": 1000, "log_interval": 1})
    cfg.update(over)
    return cfg


def _run_engine(cfg):
    import vgen_tpu.engines  # noqa: F401
    from vgen_tpu.core import ENGINE
    return ENGINE.build(dict(type=cfg["TASK_TYPE"]), cfg_update=cfg)


@pytest.mark.slow
def test_instructvideo_rwr_step(tmp_path):
    """RWR mode: reward-weighted recon loss trains a step end-to-end."""
    state = _run_engine(_iv_cfg(tmp_path, reward_mode="RWR"))
    assert int(state["step"]) == 1
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(state["params"]))


@pytest.mark.slow
def test_instructvideo_ddpo_step(tmp_path):
    """DDPO mode: stochastic rollout with log-probs + policy step."""
    state = _run_engine(_iv_cfg(tmp_path, reward_mode="DDPO",
                                temporal_reward_type=["mean", "std"],
                                motion_rep="SSIM"))
    assert int(state["step"]) == 1
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(state["params"]))


def test_ssim_consecutive_basic():
    """Identical consecutive frames => SSIM mean 1, std 0; noise lowers it."""
    from vgen_tpu.models.reward import ssim_consecutive

    still = jnp.ones((1, 4, 16, 16, 3)) * 0.5
    m, s = ssim_consecutive(still)
    np.testing.assert_allclose(np.asarray(m), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), 0.0, atol=1e-4)

    key = jax.random.PRNGKey(0)
    noisy = jnp.clip(still + 0.3 * jax.random.normal(key, still.shape), 0, 1)
    m2, _ = ssim_consecutive(noisy)
    assert float(m2[0]) < 0.9
