"""inference_higen_entrance — HiGen two-phase generation.

TPU-native re-implementation of the reference engine
(reference: tools/inferences/inference_higen_entrance.py:139-265):
phase 1 generates a 1-frame spatial-prior latent with CFG-DDIM
(:197-211), phase 2 generates the full video conditioned on that prior,
a motion factor, and a triangular appearance-similarity ramp (:216-235);
guide_scale 12 (configs/higen_infer.yaml).

Both phases are jitted programs; phase 2's conditioning tensors are
precomputed host-side exactly like the reference (:221-225).
"""

from __future__ import annotations

import logging
import os
import os.path as osp
import re
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import blocks
from ..core import (INFER_ENGINE, assign_signle_cfg, default_cfg,
                    merge_update, setup_logging, setup_seed)
from ..data.video_io import save_video

logger = logging.getLogger(__name__)


@INFER_ENGINE.register_function()
def inference_higen_entrance(cfg_update, **kwargs):
    cfg = merge_update(default_cfg(), cfg_update)
    cfg = assign_signle_cfg(cfg, cfg_update, "vldm_cfg")
    for k, v in (cfg_update or {}).items():
        cfg[k] = v

    exp_name = osp.basename(str(cfg.test_list_path)).split(".")[0]
    save_dir = osp.join(str(cfg.log_dir), exp_name)
    os.makedirs(save_dir, exist_ok=True)
    rank = jax.process_index()
    setup_logging(save_dir, rank=rank)
    key = setup_seed(int(cfg.seed) + rank)
    blocks.set_fused_tt(None)  # restore env default (trainers turn it off)

    from .infer_t2v import build_t2v_models
    clip_encoder, autoencoder, model, unet_params, diffusion = \
        build_t2v_models(cfg, key)

    f = int(cfg.max_frames)
    lat_h = int(cfg.resolution[1]) // 8
    lat_w = int(cfg.resolution[0]) // 8
    guide_scale = float(cfg.get("guide_scale", 12.0))
    ddim_steps = int(cfg.get("ddim_timesteps", 50))
    scale_factor = float(cfg.scale_factor)
    motion_factor = int(cfg.get("motion_factor", 500))
    appearance_factor = float(cfg.get("appearance_factor", 0.5))

    def cfg_model_fn(params, y, zero_y, extra):
        def model_fn(xt, t):
            x2 = jnp.concatenate([xt, xt], axis=0)
            t2 = jnp.concatenate([t[None], t[None]]) if t.ndim == 0 else \
                jnp.concatenate([t, t])
            kw = {k: jnp.concatenate([v, v], axis=0) for k, v in extra.items()}
            ctx = jnp.concatenate([y, zero_y], axis=0)
            out = model.apply(params, x2, t2, y=ctx, **kw)
            y_out, u_out = jnp.split(out, 2, axis=0)
            return diffusion.classifier_free_guidance(y_out, u_out,
                                                      guide_scale)
        return model_fn

    @jax.jit
    def phase1(unet_params, y, zero_y, key):
        """1-frame spatial prior (reference :197-211)."""
        spat_prior = jnp.zeros((1, lat_h, lat_w, 4), jnp.float32)
        appearance = jnp.ones((1, 1, 32), jnp.float32)
        motion = jnp.zeros((1, 1), jnp.int32) + motion_factor
        extra = dict(spat_prior=spat_prior, motion_cond=motion,
                     appearance_cond=appearance)
        noise = jax.random.normal(key, (1, 1, lat_h, lat_w, 4), jnp.float32)
        lat = diffusion.ddim_sample_loop(
            key, noise, cfg_model_fn(unet_params, y, zero_y, extra),
            ddim_timesteps=ddim_steps)
        return lat[:, 0]  # [1, lh, lw, 4]

    # triangular appearance similarity ramp (reference :223-225)
    sim = np.concatenate([
        np.linspace(1.0 - appearance_factor, 1.0, f)[:-1],
        np.linspace(1.0, 1.0 - appearance_factor, f)])
    appearance2 = np.stack([sim[i:i + f]
                            for i in range(len(sim) - f, -1, -1)])[None]
    appearance2 = jnp.asarray(appearance2, jnp.float32)  # [1, f, f]
    motion2 = jnp.full((1, f - 1), motion_factor, jnp.int32)

    @jax.jit
    def phase2(unet_params, vae_params, y, zero_y, spat_prior, key):
        """full video conditioned on the prior (reference :216-235)."""
        extra = dict(spat_prior=spat_prior, motion_cond=motion2,
                     appearance_cond=appearance2)
        noise = jax.random.normal(key, (1, f, lat_h, lat_w, 4), jnp.float32)
        lat = diffusion.ddim_sample_loop(
            key, noise, cfg_model_fn(unet_params, y, zero_y, extra),
            ddim_timesteps=ddim_steps)
        lat = lat / scale_factor
        frames = autoencoder.module.apply(vae_params, lat[0],
                                          method="decode_latent")
        return frames

    _, _, zero_y = clip_encoder(text=[str(cfg.negative_prompt)])
    with open(cfg.test_list_path) as fh:
        test_list = [l.strip() for l in fh if l.strip()]
    test_list = [i for i in test_list for _ in range(int(cfg.get("round", 1)))]

    outputs = []
    for idx, caption in enumerate(test_list):
        if caption.startswith("#") or not caption:
            continue
        if idx % jax.process_count() != rank:
            continue
        logger.info("[%d] HiGen sampling %r", idx, caption)
        _, _, y_words = clip_encoder(text=[caption])
        key, k1, k2 = jax.random.split(key, 3)
        t0 = time.time()
        prior = phase1(unet_params, y_words, zero_y, k1)
        frames = jax.block_until_ready(
            phase2(unet_params, autoencoder.params, y_words, zero_y,
                   prior, k2))
        dt = time.time() - t0
        cap_name = re.sub(r"[^\w\s]", "", caption).replace(" ", "_")[:80]
        path = osp.join(save_dir, f"rank{rank:02d}_{idx:04d}_{cap_name}.mp4")
        written = save_video(np.asarray(frames), path,
                             fps=int(cfg.get("target_fps", 8)),
                             mean=cfg.mean, std=cfg.std)
        logger.info("two-phase sampled in %.2fs -> %s", dt, written)
        outputs.append(written)
    logger.info("Congratulations! The inference is completed!")
    return outputs
