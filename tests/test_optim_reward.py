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
