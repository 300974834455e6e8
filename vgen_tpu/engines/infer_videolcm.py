"""inference_videolcm_entrance / _vcomposer_ — 4-step LCM sampling.

TPU-native re-implementation of the reference engines
(reference: tools/inferences/inference_videolcm_entrance.py:171-258 and
inference_videolcm_vcomposer_entrance.py). The reference drives a
diffusers LCMScheduler with num_inference_steps=4 and NO classifier-free
guidance; here the whole 4-step consistency loop + decode is one jitted
scan via our LCMScheduler.
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
from ..diffusion.lcm import LCMScheduler, guidance_scale_embedding

logger = logging.getLogger(__name__)


def make_lcm_generate_fn(cfg, model, autoencoder, diffusion):
    f = int(cfg.max_frames)
    lat_h = int(cfg.resolution[1]) // int(cfg.get("scale", 8))
    lat_w = int(cfg.resolution[0]) // int(cfg.get("scale", 8))
    in_dim = cfg.UNet["in_dim"]
    steps = int(cfg.get("num_inference_steps", 4))
    scale_factor = float(cfg.scale_factor)
    decoder_bs = int(cfg.get("decoder_bs", 8))
    chunk = decoder_bs if f % decoder_bs == 0 else f
    guidance_dim = int(cfg.UNet.get("dim", 320))
    w_fixed = float(cfg.get("set_fixed_guidance") or 9.0)

    scheduler = LCMScheduler(
        np.asarray(diffusion.alphas_cumprod),
        num_train_timesteps=diffusion.num_timesteps,
        original_inference_steps=int(cfg.get("ddim_timesteps", 50)),
        prediction_type="v_prediction")

    @jax.jit
    def generate(unet_params, vae_params, y_words, key, conds=None):
        w_emb = guidance_scale_embedding(jnp.full((1,), w_fixed),
                                         embedding_dim=guidance_dim)
        kw = dict(conds or {})

        def model_fn(xt, t):  # NO CFG (reference :172)
            return model.apply(unet_params, xt, t, y=y_words, t_w=w_emb,
                               **kw)

        knoise, ksample = jax.random.split(key)
        noise = jax.random.normal(knoise, (1, f, lat_h, lat_w, in_dim),
                                  jnp.float32)
        latents = scheduler.sample(ksample, noise, model_fn,
                                   num_inference_steps=steps)
        latents = latents / scale_factor
        lat = latents[0]
        cs = chunk
        chunks = lat.reshape(f // cs, cs, lat_h, lat_w, in_dim)
        frames = jax.lax.map(
            lambda z: autoencoder.module.apply(vae_params, z,
                                               method="decode_latent"),
            chunks)
        return frames.reshape(f, lat_h * 8, lat_w * 8, -1)

    return generate


def _videolcm_worker(cfg_update, conditioned: bool):
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
    generate = make_lcm_generate_fn(cfg, model, autoencoder, diffusion)

    with open(cfg.test_list_path) as fh:
        test_list = [l.strip() for l in fh if l.strip()]
    test_list = [i for i in test_list for _ in range(int(cfg.get("round", 1)))]

    outputs = []
    for idx, line in enumerate(test_list):
        if line.startswith("#") or not line:
            continue
        if idx % jax.process_count() != rank:
            continue
        if conditioned:
            # "videopath|||caption" lines; one generation per
            # conditioning combo (reference
            # inference_videolcm_vcomposer_entrance.py)
            from ..data.video_io import read_video_frames
            from .infer_tft2v import extract_conditions
            src, _, caption = line.partition("|||")
            caption = caption.strip()
            src = src.strip()
            if not osp.exists(src):
                logger.warning("input video %s missing — skip", src)
                continue
            f = int(cfg.max_frames)
            frames_u8 = read_video_frames(src, max_frames=f)
            if len(frames_u8) < f:
                frames_u8 = np.concatenate(
                    [frames_u8,
                     np.repeat(frames_u8[-1:], f - len(frames_u8), 0)], 0)
            partial_keys_list = [tuple(k) for k in
                                 cfg.get("partial_keys",
                                         [["y", "local_image"]])]
            combos = [(c, extract_conditions(cfg, frames_u8, c,
                                             clip_encoder))
                      for c in partial_keys_list]
        else:
            caption = line
            combos = [((), None)]
        logger.info("[%d] LCM sampling %r", idx, caption)
        _, _, y_words = clip_encoder(text=[caption])
        for combo, conds in combos:
            key, sub = jax.random.split(key)
            t0 = time.time()
            frames = jax.block_until_ready(
                generate(unet_params, autoencoder.params, y_words, sub,
                         conds))
            dt = time.time() - t0
            cap_name = re.sub(r"[^\w\s]", "",
                              caption).replace(" ", "_")[:80]
            tag = ("_".join(combo) + "_") if combo else ""
            path = osp.join(save_dir,
                            f"rank{rank:02d}_{idx:04d}_{tag}{cap_name}.mp4")
            written = save_video(np.asarray(frames), path,
                                 fps=int(cfg.get("target_fps", 8)),
                                 mean=cfg.mean, std=cfg.std)
            logger.info("LCM sampled in %.2fs -> %s", dt, written)
            outputs.append(written)
    logger.info("Congratulations! The inference is completed!")
    return outputs


@INFER_ENGINE.register_function()
def inference_videolcm_entrance(cfg_update, **kwargs):
    return _videolcm_worker(cfg_update, conditioned=False)


@INFER_ENGINE.register_function()
def inference_videolcm_vcomposer_entrance(cfg_update, **kwargs):
    """Composition-conditioned LCM (reference
    inference_videolcm_vcomposer_entrance.py): same 4-step loop with
    TFT2V condition stems; conditions are extracted like the vcomposer
    engine and passed through model kwargs."""
    return _videolcm_worker(cfg_update, conditioned=True)
