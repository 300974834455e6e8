"""Golden tests: annealing_lr vs reference AnnealingLR; reward-stack
pieces (PerPromptStatTracker, temporal attenuation, segment selection)
vs the reference math."""

import numpy as np

from vgen_tpu.utils.optim import annealing_lr

from .ref_loader import REF, _load


def _ref_lr(base_lr, warmup, total, mode, step):
    """Reference AnnealingLR.get_lr (utils/optim/lr_scheduler.py:19-30)
    evaluated standalone."""
    import math

    if warmup > 0 and step <= warmup:
        return base_lr * step / warmup
    ratio = min(1.0, max(0.0, (step - warmup) / (total - warmup)))
    if mode == "linear":
        return base_lr * (1 - ratio)
    if mode == "cosine":
        return base_lr * (math.cos(math.pi * ratio) + 1.0) / 2.0
    return base_lr


def test_annealing_lr_matches_reference():
    for mode in ("linear", "cosine", "none"):
        sched = annealing_lr(3e-4, 100, 1000, mode)
        for step in (0, 1, 50, 100, 101, 500, 999, 1000, 1500):
            ours = float(sched(step))
            ref = _ref_lr(3e-4, 100, 1000, mode, step)
            assert abs(ours - ref) < 1e-9, (mode, step, ours, ref)


def test_per_prompt_stat_tracker_matches_reference():
    ref_mod = _load("ref_stat", f"{REF}/utils/reward/stat_tracking.py")
    from vgen_tpu.models.reward import PerPromptStatTracker

    rng = np.random.RandomState(0)
    ref = ref_mod.PerPromptStatTracker(buffer_size=8, min_count=4)
    mine = PerPromptStatTracker(buffer_size=8, min_count=4)
    for _ in range(5):
        prompts = rng.choice(["a", "b", "c"], size=6).tolist()
        rewards = rng.randn(6).astype(np.float32)
        a1 = ref.update(list(prompts), rewards.copy())
        a2 = mine.update(list(prompts), rewards.copy())
        np.testing.assert_allclose(a2, a1, rtol=1e-5, atol=1e-6)
    s1, s2 = ref.get_stats(), mine.get_stats()
    assert set(s1) == set(s2)
    for k in s1:
        assert abs(s1[k]["mean"] - s2[k]["mean"]) < 1e-6


def test_temporal_reward_sign_conventions():
    """motion_advantages() is penalty-style (higher = jitterier). The
    loss-style base reward_scorer must ADD it; the reward-style RWR
    advantages and DDPO rollout scores must SUBTRACT it, so smoother
    videos always come out better ('Ensure that SSIM is generally
    high', reference reward.py:634)."""
    import jax
    import jax.numpy as jnp

    from vgen_tpu.core.config import AttrDict
    from vgen_tpu.models.reward import DDPORewardModel, RWRRewardModel

    cfg = AttrDict({"scale_factor": 0.18215})
    key = jax.random.PRNGKey(0)

    def make(cls, scores):
        m = cls(cfg, clip_encoder=None, autoencoder=None,
                temporal_reward_type=["mean", "std"], motion_rep="SSIM")
        m.video_scores = lambda k, tok, x: dict(scores)
        return m

    clip_score = jnp.asarray([0.5, 0.5])
    smooth = {"scores": clip_score,
              "ssim_mean": jnp.asarray([0.95, 0.95]),
              "ssim_std": jnp.asarray([0.01, 0.01])}
    jitter = {"scores": clip_score,
              "ssim_mean": jnp.asarray([0.20, 0.20]),
              "ssim_std": jnp.asarray([0.30, 0.30])}

    x0 = jnp.zeros((2, 2, 2, 2, 4))

    # DDPO: rollout scores are reward-style -> smooth must score higher
    sm = make(DDPORewardModel, smooth).rollout_scores(key, None, x0)
    ji = make(DDPORewardModel, jitter).rollout_scores(key, None, x0)
    assert float(sm.min()) > float(ji.max())

    # RWR: the advantage multiplies loss_recon; with equal loss_recon a
    # smoother video must get a LARGER reward-weighted loss weight.
    lr = jnp.asarray([1.0, 1.0])
    rl_s = make(RWRRewardModel, smooth).reward_scorer(key, None, x0,
                                                      loss_recon=lr)
    rl_j = make(RWRRewardModel, jitter).reward_scorer(key, None, x0,
                                                      loss_recon=lr)
    assert float(rl_s) > float(rl_j)


def test_adamw_lowmem_matches_optax_adamw():
    """With f32 state the low-mem AdamW must track optax.adamw exactly;
    with bf16 state it must stay within bf16 mantissa noise."""
    import jax
    import jax.numpy as jnp

    from vgen_tpu.utils.optim import adamw_lowmem

    params = {"w": jnp.linspace(-1.0, 1.0, 64).reshape(8, 8),
              "b": jnp.ones((8,)) * 0.3}
    import optax
    ref = optax.adamw(1e-3, weight_decay=0.01)
    f32 = adamw_lowmem(1e-3, weight_decay=0.01, state_dtype=jnp.float32)
    b16 = adamw_lowmem(1e-3, weight_decay=0.01, state_dtype=jnp.bfloat16)

    sr, s32, s16 = ref.init(params), f32.init(params), b16.init(params)
    pr = p32 = p16 = params
    for step in range(5):
        g = jax.tree.map(
            lambda p: jnp.sin(p + step) * 0.1, params)
        ur, sr = ref.update(g, sr, pr)
        u32, s32 = f32.update(g, s32, p32)
        u16, s16 = b16.update(g, s16, p16)
        pr = optax.apply_updates(pr, ur)
        p32 = optax.apply_updates(p32, u32)
        p16 = optax.apply_updates(p16, u16)
    for k in params:
        np.testing.assert_allclose(np.asarray(p32[k]), np.asarray(pr[k]),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(p16[k]), np.asarray(pr[k]),
                                   rtol=2e-2, atol=2e-4)
