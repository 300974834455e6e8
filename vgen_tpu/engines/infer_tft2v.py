"""TF-T2V inference engines: text-only, +SR600 chain, and VideoComposer.

TPU-native re-implementation of the reference engines
(reference: tools/inferences/inference_tft2v_entrance.py,
inference_tft2v_sr600_entrance.py, inference_tft2v_vcomposer_entrance.py).

  * text-only: the t2v flow with the TFT2V UNet (conditions absent).
  * sr600 chain: stage-1 output fed straight into the SR600 engine.
  * vcomposer: condition maps are extracted AT INFERENCE from an input
    video (reference :369-442) — depth (MiDaS), sketch (pidinet+GAN),
    canny (cv2), masked video, local_image, CLIP image — and one video is
    generated per ``partial_keys`` combination (:486-504). Extractors
    come from vgen_tpu.data.annotators; unavailable ones are skipped with
    a warning.
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
from ..data import transforms as T
from ..data.video_io import read_video_frames, save_video

logger = logging.getLogger(__name__)


@INFER_ENGINE.register_function()
def inference_tft2v_entrance(cfg_update, **kwargs):
    """Text-only TF-T2V: identical flow to t2v with the TFT2V UNet."""
    from .infer_t2v import inference_text2video_entrance
    return inference_text2video_entrance(cfg_update, **kwargs)


@INFER_ENGINE.register_function()
def inference_tft2v_sr600_entrance(cfg_update, **kwargs):
    """Stage-1 TF-T2V then SR600 refinement over the outputs
    (reference inference_tft2v_sr600_entrance.py)."""
    from .infer_sr600 import inference_sr600_entrance
    from .infer_t2v import inference_text2video_entrance
    stage1 = inference_text2video_entrance(cfg_update, **kwargs) or []
    sr_cfg = dict(cfg_update)
    sr_cfg.update(dict(cfg_update.get("sr_cfg", {})))
    # hand the stage-1 mp4s to the SR pass via an explicit list file
    if stage1:
        list_path = osp.join(str(cfg_update.get("log_dir",
                                                "workspace/experiments")),
                             "sr600_inputs.txt")
        with open(cfg_update.get("test_list_path")) as fh:
            captions = [l.strip() for l in fh if l.strip()
                        and not l.startswith("#")]
        with open(list_path, "w") as fh:
            for cap, path in zip(captions, stage1):
                if path:
                    fh.write(f"{cap}|||{path}\n")
        sr_cfg["test_list_path"] = list_path
    return inference_sr600_entrance(sr_cfg, **kwargs)


def extract_conditions(cfg, frames_u8, partial_keys, clip_encoder):
    """Condition maps from pixel frames (reference vcomposer engine
    :369-442). Returns dict of [1, f, H, W, C] arrays in model layout."""
    from ..data import annotators

    w, h = tuple(cfg.resolution)
    video = T.video_transform(frames_u8, (w, h), cfg.mean, cfg.std)
    f = len(video)
    conds = {}
    for key in partial_keys:
        if key in ("y", "image", "fps"):
            continue
        try:
            if key == "canny":
                maps = np.stack([annotators.canny(fr) for fr in frames_u8])
                maps = T.center_crop_wide(
                    np.repeat(maps[..., None], 3, -1), (w, h))[..., :1]
                conds["canny"] = jnp.asarray(
                    maps.astype(np.float32) / 255.0)[None]
            elif key in ("depthmap", "depth"):
                maps = annotators.midas_depth(frames_u8, (w, h),
                                              clamp=float(cfg.depth_clamp),
                                              std=float(cfg.depth_std))
                conds["depth"] = jnp.asarray(maps)[None]
            elif key in ("sketch", "single_sketch"):
                maps = annotators.pidinet_sketch(frames_u8, (w, h),
                                                 mean=cfg.sketch_mean,
                                                 std=cfg.sketch_std)
                if key == "single_sketch":
                    maps = np.repeat(maps[:1], f, axis=0)
                conds[key] = jnp.asarray(maps)[None]
            elif key in ("masked", "mask"):
                mask = np.ones((f, h, w, 1), np.float32)
                mask[:, :, w // 2:] = 0.0  # right-half inpainting mask
                masked = video * mask
                conds["masked"] = jnp.asarray(
                    np.concatenate([masked, mask], axis=-1))[None]
            elif key == "local_image":
                local = np.repeat(video[:1], f, axis=0)
                conds["local_image"] = jnp.asarray(local)[None]
            elif key == "motion":
                # frame-difference flow proxy (the reference's optional
                # motion-vector extractor is a commented-out pip dep,
                # :369-370)
                diff = np.diff(video.mean(-1), axis=0, prepend=video[:1].mean(-1))
                motion = np.stack([diff, diff], axis=-1)
                conds["motion"] = jnp.asarray(motion)[None]
        except annotators.AnnotatorUnavailable as e:
            logger.warning("condition %r unavailable: %s — skipped", key, e)
    return conds


@INFER_ENGINE.register_function()
def inference_tft2v_vcomposer_entrance(cfg_update, **kwargs):
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
    guide_scale = float(cfg.guide_scale)
    ddim_steps = int(cfg.get("ddim_timesteps", 50))
    scale_factor = float(cfg.scale_factor)
    partial_keys_list = [tuple(k) for k in cfg.get("partial_keys",
                                                   [["y", "depth"]])]

    def generate(unet_params, vae_params, y, zero_y, conds, key):
        def model_fn(xt, t):
            x2 = jnp.concatenate([xt, xt], axis=0)
            t2 = jnp.concatenate([t[None], t[None]]) if t.ndim == 0 else \
                jnp.concatenate([t, t])
            ctx = jnp.concatenate([y, zero_y], axis=0)
            kw = {k: jnp.concatenate([v, v], axis=0)
                  for k, v in conds.items()}
            out = model.apply(unet_params, x2, t2, y=ctx, **kw)
            y_out, u_out = jnp.split(out, 2, axis=0)
            return diffusion.classifier_free_guidance(y_out, u_out,
                                                      guide_scale)

        noise = jax.random.normal(key, (1, f, lat_h, lat_w, 4), jnp.float32)
        lat = diffusion.ddim_sample_loop(key, noise, model_fn,
                                         ddim_timesteps=ddim_steps)
        lat = lat / scale_factor
        return autoencoder.module.apply(vae_params, lat[0],
                                        method="decode_latent")

    generate = jax.jit(generate)
    _, _, zero_y = clip_encoder(text=[str(cfg.negative_prompt)])

    with open(cfg.test_list_path) as fh:
        test_list = [l.strip() for l in fh if l.strip()]

    outputs = []
    for idx, line in enumerate(test_list):
        if line.startswith("#"):
            continue
        if idx % jax.process_count() != rank:
            continue
        vid_key, _, caption = line.partition("|||")
        caption = caption.strip()
        src = vid_key.strip()
        if not osp.exists(src):
            logger.warning("input video %s missing — skip", src)
            continue
        frames_u8 = read_video_frames(src, max_frames=f)
        if len(frames_u8) < f:
            frames_u8 = np.concatenate(
                [frames_u8,
                 np.repeat(frames_u8[-1:], f - len(frames_u8), 0)], 0)
        _, _, y_words = clip_encoder(text=[caption])

        # one generation per conditioning combo (reference :486-504)
        for combo in partial_keys_list:
            conds = extract_conditions(cfg, frames_u8, combo, clip_encoder)
            key, sub = jax.random.split(key)
            t0 = time.time()
            frames = jax.block_until_ready(
                generate(unet_params, autoencoder.params, y_words, zero_y,
                         conds, sub))
            dt = time.time() - t0
            cap_name = re.sub(r"[^\w\s]", "", caption).replace(" ", "_")[:60]
            tag = "_".join(combo)
            path = osp.join(save_dir,
                            f"rank{rank:02d}_{idx:04d}_{tag}_{cap_name}.mp4")
            written = save_video(np.asarray(frames), path,
                                 fps=int(cfg.get("target_fps", 8)),
                                 mean=cfg.mean, std=cfg.std)
            logger.info("vcomposer [%s] sampled in %.2fs -> %s", tag, dt,
                        written)
            outputs.append(written)
    logger.info("Congratulations! The inference is completed!")
    return outputs
