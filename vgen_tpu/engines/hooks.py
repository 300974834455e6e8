"""Train-time visualization hooks (VISUAL registry).

Equivalent of the reference hooks (reference: tools/hooks/
visual_train_t2v.py:33-88 and variants): every viz_interval steps, run
CFG-DDIM sampling with the CURRENT training params for each partial_keys
conditioning subset and save captioned video grids.
"""

from __future__ import annotations

import logging
import os
import os.path as osp
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import VISUAL
from ..data.video_io import save_video_with_caption

logger = logging.getLogger(__name__)


class _VisualBase:
    def __init__(self, cfg=None, model=None, diffusion=None, autoencoder=None,
                 partial_keys: Sequence[Sequence[str]] = (("y",),),
                 guide_scale: float = 9.0, use_offset_noise: bool = False,
                 **kwargs):
        self.cfg = cfg
        # sample in eval mode (dropout off) regardless of the training
        # module's mode — the reference calls model.eval() in its hooks
        if model is not None and getattr(model, "training", False):
            import dataclasses
            model = dataclasses.replace(model, training=False)
        self.model = model
        self.diffusion = diffusion
        self.autoencoder = autoencoder
        self.partial_keys = [tuple(k) for k in partial_keys]
        self.guide_scale = float(guide_scale)
        self.use_offset_noise = use_offset_noise

    def _sample(self, params, y, zero_y, frames: int, key,
                fps: Optional[jnp.ndarray] = None, extra_cond=None):
        cfg = self.cfg
        lat_h = int(cfg.resolution[1]) // 8
        lat_w = int(cfg.resolution[0]) // 8

        def model_fn(xt, t):
            x2 = jnp.concatenate([xt, xt], axis=0)
            t2 = jnp.concatenate([t, t], axis=0) if t.ndim else \
                jnp.stack([t, t])
            ctx = jnp.concatenate([y, zero_y], axis=0)
            kw = dict(extra_cond or {})
            if fps is not None:
                kw["fps"] = jnp.concatenate([fps, fps], axis=0)
            out = self.model.apply(params, x2, t2, y=ctx, **kw)
            y_out, u_out = jnp.split(out, 2, axis=0)
            return self.diffusion.classifier_free_guidance(
                y_out, u_out, self.guide_scale)

        noise = jax.random.normal(key, (1, frames, lat_h, lat_w,
                                        cfg.UNet["in_dim"]), jnp.float32)
        latents = self.diffusion.ddim_sample_loop(
            key, noise, model_fn, ddim_timesteps=int(cfg.get("ddim_timesteps", 50)))
        latents = latents / float(cfg.scale_factor)
        frames_out = self.autoencoder.decode(latents[0],
                                             params=self.autoencoder.params)
        return frames_out

    def run(self, params, zero_y, y_words, step: int, captions, **kwargs):
        out_dir = osp.join(str(self.cfg.log_dir), "visuals")
        os.makedirs(out_dir, exist_ok=True)
        key = jax.random.PRNGKey(int(self.cfg.seed) + step)
        frames = int(self.cfg.get("max_frames") or 4)
        caption = captions[0] if captions else ""
        for keys in self.partial_keys:
            fps = jnp.asarray([int(self.cfg.get("target_fps", 8))],
                              jnp.int32) if "fps" in keys else None
            video = self._sample(params, y_words[:1], zero_y[:1], frames,
                                 key, fps=fps)
            name = f"step{step:07d}_{'_'.join(keys)}.mp4"
            save_video_with_caption(np.asarray(video), caption,
                                    osp.join(out_dir, name),
                                    fps=int(self.cfg.get("target_fps", 8)))
        logger.info("visual hook wrote samples at step %d", step)


@VISUAL.register_class()
class VisualTrainTextToVideo(_VisualBase):
    """Text-conditioned sampling grids (reference visual_train_t2v.py)."""


@VISUAL.register_class()
class VisualTrainTextImageToVideo(_VisualBase):
    """Text+image-conditioned variant (reference t2v hooks for i2v/it2v,
    tools/hooks/visual_train_it2v_video.py)."""


@VISUAL.register_class()
class VisualTrainDreamVideo(_VisualBase):
    """DreamVideo variant (reference tools/hooks/
    visual_train_dreamvideo.py): samples pass the subject-image CLIP
    feature as the adapter condition; captions flow through the custom
    embedder so the learned '*' token is active."""

    def __init__(self, *args, adapter_condition_lam: float = 1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.adapter_condition_lam = float(adapter_condition_lam)

    def run(self, params, zero_y, y_words, step: int, captions,
            adapter_condition=None, **kwargs):
        extra = None
        if adapter_condition is not None:
            extra = {
                "adapter_condition": jnp.concatenate(
                    [adapter_condition[:1], adapter_condition[:1]], axis=0),
                "adapter_condition_lam": self.adapter_condition_lam,
            }
        self._run_with_extra(params, zero_y, y_words, step, captions, extra)

    def _run_with_extra(self, params, zero_y, y_words, step, captions,
                        extra):
        out_dir = osp.join(str(self.cfg.log_dir), "visuals")
        os.makedirs(out_dir, exist_ok=True)
        key = jax.random.PRNGKey(int(self.cfg.seed) + step)
        frames = int(self.cfg.get("max_frames") or 4)
        caption = captions[0] if captions else ""
        for keys in self.partial_keys:
            video = self._sample(params, y_words[:1], zero_y[:1], frames,
                                 key, extra_cond=extra)
            name = f"step{step:07d}_{'_'.join(keys)}.mp4"
            save_video_with_caption(np.asarray(video), caption,
                                    osp.join(out_dir, name),
                                    fps=int(self.cfg.get("target_fps", 8)))
        logger.info("dreamvideo visual hook wrote samples at step %d", step)


@VISUAL.register_class()
class VisualVideoTextDuringTrainUnClip(_VisualBase):
    """InstructVideo variant (reference tools/hooks/
    visual_train_instructvideo.py): same CFG-DDIM sampling — the LoRA
    deltas live in the training params, so the base flow applies."""
