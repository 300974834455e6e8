"""Reward models for InstructVideo (HPSv2-style CLIP scoring).

TPU-native re-implementation of the reference reward stack
(reference: utils/reward/reward.py:46-644 + bundled open_clip fork).
The HPSv2 reward model is an OpenCLIP ViT-H — we reuse our CLIP towers
(one kernel path for conditioning AND reward) with HPS_v2.pt weights
loaded through the CLIP checkpoint importer.

Implements: latent decode -> CLIP-space resize/normalize (:133-152),
Segmental Video Reward frame selection fixed_first/TSN (:154-165),
Temporally Attenuated Reward exp(-|i-f/2|*lambda) weighting (:174-190),
reward = mean diag of image-text logits, loss = 1 - score (:199-213);
RWR/DDPO variants + PerPromptStatTracker (stat_tracking.py:14-45).
"""

from __future__ import annotations

import logging
from collections import defaultdict, deque
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .clip import CLIP_MEAN, CLIP_STD

logger = logging.getLogger(__name__)


def resize_bilinear(x, hw):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, hw[0], hw[1], c), method="bilinear")


class DiffRewardModel:
    """HPSv2 segmental/temporally-attenuated video reward."""

    def __init__(self, cfg, clip_encoder, autoencoder, segments: int = 8,
                 selection_method: str = "fixed_first",
                 exponential_TSN: bool = True, lambda_TAR: float = 1.0,
                 reward_weights=None, ST_reward_weights=None,
                 data_align_method=None, data_align_coef: float = 10.0,
                 adv_clip_max: float = 5.0, **kwargs):
        self.cfg = cfg
        self.clip = clip_encoder
        self.autoencoder = autoencoder
        self.segments = segments
        self.selection_method = selection_method
        self.exponential_TSN = exponential_TSN
        self.lambda_TAR = lambda_TAR
        self.reward_weights = reward_weights or {"reward": 1, "reg": 1}
        self.ST_reward_weights = ST_reward_weights or {"spatial": 1,
                                                       "temporal": 1}
        self.data_align_method = data_align_method
        self.data_align_coef = data_align_coef
        self.adv_clip_max = adv_clip_max
        self.vit_hw = tuple(cfg.get("vit_resolution", (224, 224)))[::-1] \
            if isinstance(cfg.get("vit_resolution"), (list, tuple)) else (224, 224)

    def _select_segments(self, key, frames, f: int):
        """fixed_first / TSN segment frame indices (reference :154-165)."""
        span = max(f // self.segments, 1)
        segs = min(self.segments, f)
        if self.selection_method == "fixed_first":
            idx = jnp.arange(segs) * span
            idx = jnp.broadcast_to(idx, (frames.shape[0], segs))
        elif self.selection_method == "TSN":
            local = jax.random.randint(key, (frames.shape[0], segs), 0, span)
            idx = local + jnp.arange(segs)[None, :] * span
        else:
            raise NotImplementedError(self.selection_method)
        return jnp.clip(idx, 0, f - 1)

    def reward_scorer(self, key, tokens, denoised_x0, loss_recon=None,
                      t_round=None):
        """Differentiable reward loss from denoised latents
        (reference :128-231). denoised_x0: [b, f, lh, lw, 4] latents;
        tokens: [b, 77] CLIP tokens. Returns scalar loss."""
        scale_factor = float(self.cfg.scale_factor)
        video = denoised_x0 / scale_factor
        b, f = video.shape[0], video.shape[1]

        lat = video.reshape((b * f,) + video.shape[2:])
        frames = self.autoencoder.module.apply(
            self.autoencoder.params, lat, method="decode_latent")
        # denormalize to [0,1] then CLIP space (reference :147-152)
        mean = jnp.asarray(self.cfg.get("mean", (0.5,) * 3))
        std = jnp.asarray(self.cfg.get("std", (0.5,) * 3))
        frames = jnp.clip(frames * std + mean, 0.0, 1.0)
        frames = resize_bilinear(frames, self.vit_hw)
        frames = (frames - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
        frames = frames.reshape((b, f) + frames.shape[1:])

        idx = self._select_segments(key, frames, f)  # [b, segs]
        segs = idx.shape[1]
        sel = jnp.take_along_axis(
            frames, idx[:, :, None, None, None], axis=1)  # [b, s, h, w, 3]
        sel = sel.reshape((b * segs,) + sel.shape[2:])

        img_feat = self.clip.module.apply(self.clip.params, sel,
                                          method="encode_image")
        txt_feat, _ = self.clip.module.apply(self.clip.params, tokens, 0,
                                             method="encode_text_pooled")
        img_feat = img_feat / jnp.linalg.norm(img_feat, axis=-1, keepdims=True)
        txt_feat = txt_feat / jnp.linalg.norm(txt_feat, axis=-1, keepdims=True)
        logits = img_feat.reshape(b, segs, -1) @ txt_feat.T  # [b, s, b]
        diag = jnp.diagonal(logits, axis1=0, axis2=2).T      # [b, s]

        if self.exponential_TSN:  # TAR weighting (reference :174-176)
            coef = jnp.exp(-jnp.abs(idx - f // 2) * self.lambda_TAR)
            diag = coef * diag
        scores = diag.mean(axis=1)  # [b]

        advantages = self.ST_reward_weights["spatial"] * (1.0 - scores)
        if self.data_align_method == "ddpm" and loss_recon is not None:
            coef = jnp.exp(-self.data_align_coef
                           * jax.lax.stop_gradient(loss_recon))
            reward_loss = (coef * advantages).mean()
        else:
            reward_loss = advantages.mean()
        reward_loss = jnp.clip(reward_loss, -self.adv_clip_max,
                               self.adv_clip_max)
        return self.reward_weights["reward"] * reward_loss


class PerPromptStatTracker:
    """Per-prompt advantage normalization (reference
    utils/reward/stat_tracking.py:14-45). Host-side state."""

    def __init__(self, buffer_size: int = 16, min_count: int = 2):
        self.buffer_size = buffer_size
        self.min_count = min_count
        self.stats = defaultdict(lambda: deque(maxlen=self.buffer_size))

    def update(self, prompts: Sequence[str], rewards: np.ndarray) -> np.ndarray:
        rewards = np.asarray(rewards, np.float64)
        advantages = np.empty_like(rewards)
        for prompt in np.unique(prompts):
            mask = np.asarray(prompts) == prompt
            self.stats[prompt].extend(rewards[mask])
            if len(self.stats[prompt]) < self.min_count:
                mean, std = rewards.mean(), rewards.std() + 1e-6
            else:
                arr = np.asarray(self.stats[prompt])
                mean, std = arr.mean(), arr.std() + 1e-6
            advantages[mask] = (rewards[mask] - mean) / std
        return advantages

    def get_stats(self):
        """Per-prompt reward stats (reference stat_tracking.py:41-45)."""
        return {k: {"mean": np.mean(v), "std": np.std(v), "count": len(v)}
                for k, v in self.stats.items()}


class RWRRewardModel(DiffRewardModel):
    """Reward-weighted regression variant (reference reward.py:234+):
    exp(reward/beta)-weighted diffusion loss."""

    def __init__(self, *args, rwr_beta: float = 1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.rwr_beta = rwr_beta

    def weights(self, key, tokens, denoised_x0):
        loss = self.reward_scorer(key, tokens, denoised_x0)
        reward = 1.0 - loss  # scorer returns (1 - score)-style loss
        return jnp.exp(reward / self.rwr_beta)


class DDPORewardModel(DiffRewardModel):
    """DDPO policy-gradient variant (reference reward.py:427+) with
    per-prompt advantage normalization."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.stat_tracker = PerPromptStatTracker()

    def advantages(self, prompts, rewards):
        return self.stat_tracker.update(prompts, np.asarray(rewards))


def ssim_smoothness(frames: jnp.ndarray) -> jnp.ndarray:
    """Mean SSIM between consecutive frames — the reference's motion
    representation metric (reference reward.py:618+). frames: [f,h,w,3]
    in [0,1]."""
    x = frames[:-1]
    y = frames[1:]
    mu_x = x.mean(axis=(1, 2, 3))
    mu_y = y.mean(axis=(1, 2, 3))
    var_x = x.var(axis=(1, 2, 3))
    var_y = y.var(axis=(1, 2, 3))
    cov = ((x - mu_x[:, None, None, None])
           * (y - mu_y[:, None, None, None])).mean(axis=(1, 2, 3))
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
        (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2))
    return ssim.mean()
