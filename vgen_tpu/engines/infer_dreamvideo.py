"""inference_dreamvideo_entrance — customized subject/motion generation.

TPU-native re-implementation of the reference engine
(reference: tools/inferences/inference_dreamvideo_entrance.py:52-304):
load the base checkpoint, MERGE identity/motion adapter partial state
dicts over it (:166-190), load the textual-inversion embedding, then
CFG-DDIM with the custom embedder and adapter condition; optional
DDIM-inversion starting noise (``inverse_noise_strength``,
reference README.MD:376).
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
from PIL import Image

from ..models import blocks
from ..core import (EMBEDDER, EMBEDMANAGER, INFER_ENGINE, assign_signle_cfg,
                    default_cfg, merge_update, setup_logging, setup_seed)
from ..data import transforms as T
from ..data.video_io import save_video
from ..utils.ckpt import load_unet_params

logger = logging.getLogger(__name__)


def merge_partial_checkpoints(unet_params, paths):
    """Merge adapter-only checkpoints over the base params by key
    (reference merges identity/motion dicts by index/path, :166-190)."""
    for path in paths:
        if path and os.path.exists(str(path)):
            unet_params = load_unet_params(str(path), unet_params,
                                           strict=False)
            logger.info("merged partial checkpoint %s", path)
    return unet_params


def _resolve_adapter(cfg, kind: str, learn_log_dir):
    """Reference adapter-path resolution (reference
    inference_dreamvideo_entrance.py:168-190): either ``*_adapter_path``
    (direct) or ``*_adapter_index`` (resolved into the learning run's
    ``<log_dir>/<cfg_name>/checkpoints/adapter_%08d.pth``), never both.
    Falls back to the repo-native ``*_adapter_ckpt`` key."""
    path_k, idx_k = f"{kind}_adapter_path", f"{kind}_adapter_index"
    if cfg.get(path_k) is not None and cfg.get(idx_k) is not None:
        raise Exception(f"Both {idx_k} and {path_k} are used, "
                        "please set only one.")
    if cfg.get(idx_k) is not None:
        src_cfg = str(cfg["subject_cfg" if kind == "identity"
                          else "motion_cfg"])
        cfg_name = src_cfg.split("/")[-1].split(".")[0]
        return os.path.join(str(learn_log_dir or ""), cfg_name,
                            "checkpoints",
                            f"adapter_{int(cfg[idx_k]):08d}.pth")
    return cfg.get(path_k) or cfg.get(f"{kind}_adapter_ckpt")


@INFER_ENGINE.register_function()
def inference_dreamvideo_entrance(cfg_update, **kwargs):
    cfg = merge_update(default_cfg(), cfg_update)
    cfg = assign_signle_cfg(cfg, cfg_update, "vldm_cfg")
    # subject/motion learning-run config merges (reference :68-77); each
    # merged cfg's log_dir locates that run's checkpoints
    cfg_prefix = str(cfg.get("cfg_prefix", "") or "")
    subject_log_dir = motion_log_dir = None
    if cfg.get("subject_cfg"):
        cfg = assign_signle_cfg(cfg, cfg_update, "subject_cfg")
        subject_log_dir = os.path.join(cfg_prefix, str(cfg.log_dir))
    if cfg.get("motion_cfg"):
        cfg = assign_signle_cfg(cfg, cfg_update, "motion_cfg")
        motion_log_dir = os.path.join(cfg_prefix, str(cfg.log_dir))
    for k, v in (cfg_update or {}).items():
        cfg[k] = v
    # reference alias surface (:99,143-160): base_model is the base
    # checkpoint, text_embedding_path the TI embedding file
    if cfg.get("base_model") and not cfg.get("test_model"):
        cfg["test_model"] = cfg["base_model"]
    if cfg.get("text_embedding_path") and not cfg.get("embedding_ckpt"):
        cfg["embedding_ckpt"] = os.path.join(cfg_prefix,
                                             str(cfg.text_embedding_path))
    if cfg.get("use_random_seed"):
        import random as _random
        cfg["seed"] = _random.randint(0, 10000)

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
    # merge identity/motion adapters (reference :166-190)
    unet_params = merge_partial_checkpoints(
        unet_params, [_resolve_adapter(cfg, "identity", subject_log_dir),
                      _resolve_adapter(cfg, "motion", motion_log_dir)])

    custom_embedder = EMBEDDER.build(dict(
        cfg.get("custom_embedder",
                {"type": "FrozenOpenCLIPCustomEmbedder",
                 "arch": cfg.embedder.get("arch", "ViT-H-14"),
                 "layer": "penultimate",
                 "pretrained": cfg.embedder.get("pretrained")})))
    custom_embedder.load_params(clip_encoder.params)
    manager = EMBEDMANAGER.build(dict(
        cfg.get("embedding_manager",
                {"type": "EmbeddingManager", "placeholder_strings": ["*"],
                 "token_dim": cfg.UNet["context_dim"]})),
        embedder=custom_embedder)
    if cfg.get("embedding_ckpt") and os.path.exists(str(cfg.embedding_ckpt)):
        manager.load(str(cfg.embedding_ckpt))

    lam = float(cfg.get("adapter_condition_lam", 1.0))
    noise_strength = float(cfg.get("noise_strength", 0) or 0)
    guide_scale = float(cfg.guide_scale)
    f = int(cfg.max_frames)
    lat_h = int(cfg.resolution[1]) // 8
    lat_w = int(cfg.resolution[0]) // 8
    scale_factor = float(cfg.scale_factor)

    @jax.jit
    def generate(unet_params, vae_params, y_words, y_neg, acond,
                 inverse_noise, inv_strength, key):
        def model_fn(xt, t):
            x2 = jnp.concatenate([xt, xt], axis=0)
            t2 = jnp.concatenate([t[None], t[None]]) if t.ndim == 0 else \
                jnp.concatenate([t, t])
            ctx = jnp.concatenate([y_words, y_neg], axis=0)
            ac = jnp.concatenate([acond, acond], axis=0)
            out = model.apply(unet_params, x2, t2, y=ctx,
                              adapter_condition=ac, adapter_condition_lam=lam)
            y_out, u_out = jnp.split(out, 2, axis=0)
            return diffusion.classifier_free_guidance(y_out, u_out,
                                                      guide_scale)

        kn, ko, ks = jax.random.split(key, 3)
        noise = jax.random.normal(kn, (1, f, lat_h, lat_w, 4), jnp.float32)
        # offset noise on the starting noise (reference
        # inference_dreamvideo_entrance.py:251-254: per-(b,c,f) offset,
        # shared over h,w; our layout is [b,f,h,w,c])
        if noise_strength > 0:
            offset = jax.random.normal(ko, (1, f, 1, 1, 4), jnp.float32)
            noise = noise + noise_strength * offset
        # DDIM-inversion noise mixing (reference
        # inference_dreamvideo_entrance.py:256-257): motion customization
        # starts from the inverted reference-video noise
        noise = (inv_strength ** 0.5 * inverse_noise
                 + (1.0 - inv_strength) ** 0.5 * noise)
        latents = diffusion.ddim_sample_loop(
            ks, noise, model_fn, ddim_timesteps=int(cfg.get("ddim_timesteps", 50)))
        latents = latents / scale_factor
        frames = autoencoder.module.apply(vae_params, latents[0],
                                          method="decode_latent")
        return frames

    _, _, zero_y_negative = clip_encoder(text=[str(cfg.negative_prompt)])
    # empty-string embedding for the DDIM-inversion conditioning — the
    # reference inverts with zero_y (empty prompt), NOT the negative
    # prompt (inference_dreamvideo_entrance.py:133,206)
    _, _, zero_y = clip_encoder(text=[""])

    # optional DDIM-inversion of a reference video's latents into the
    # starting noise (reference :199-209)
    inv_strength = float(cfg.get("inverse_noise_strength", 0) or 0)
    inverse_noise = jnp.zeros((1, f, lat_h, lat_w, 4), jnp.float32)
    if inv_strength > 0:
        lat_path = str(cfg.get("latents_path", ""))
        if os.path.exists(lat_path):
            import torch as _torch
            lat = _torch.load(lat_path, map_location="cpu")
            lat = jnp.asarray(lat.numpy()).transpose(0, 2, 3, 4, 1)

            def uncond_fn(xt, t):
                tb = jnp.broadcast_to(t, (xt.shape[0],)) if t.ndim == 0 \
                    else t
                zy = jnp.broadcast_to(zero_y,
                                      (xt.shape[0],) + zero_y.shape[1:])
                return model.apply(unet_params, xt, tb, y=zy)

            inverse_noise = diffusion.ddim_reverse_sample_loop(
                lat, uncond_fn,
                ddim_timesteps=int(cfg.get("ddim_timesteps", 50)))
        else:
            logger.warning("inverse_noise_strength>0 but latents_path %r "
                           "missing — using pure noise", lat_path)
            inv_strength = 0.0

    with open(cfg.test_list_path) as fh:
        test_list = [l.strip() for l in fh if l.strip()]
    test_list = [i for i in test_list for _ in range(int(cfg.get("round", 1)))]

    # subject image for the adapter condition (identity customization)
    acond_dim = int(cfg.UNet.get("temporal_adapter_condition_dim")
                    or cfg.UNet.get("context_dim", 1024))
    acond = jnp.zeros((1, acond_dim))
    subj = cfg.get("subject_image")
    if subj and os.path.exists(str(subj)):
        img = np.asarray(Image.open(str(subj)).convert("RGB"))
        vit = T.vit_transform(img, tuple(cfg.vit_resolution))
        acond = clip_encoder.module.apply(clip_encoder.params,
                                          jnp.asarray(vit)[None],
                                          method="encode_image")

    def image_acond(img_path):
        """CLIP-encode one appearance-guidance image (reference :223-236:
        per-line img_key from test_data_dir)."""
        img = np.asarray(Image.open(str(img_path)).convert("RGB"))
        vit = T.vit_transform(img, tuple(cfg.vit_resolution))
        return clip_encoder.module.apply(clip_encoder.params,
                                         jnp.asarray(vit)[None],
                                         method="encode_image")

    outputs = []
    for idx, line in enumerate(test_list):
        if line.startswith("#") or not line:
            continue
        if idx % jax.process_count() != rank:
            continue
        # reference test lines are "img_key|||caption" (:223); the image
        # (under test_data_dir) is that line's appearance guidance
        img_key, _, caption = line.rpartition("|||")
        caption = caption.strip()
        line_acond = acond
        if img_key:
            ipath = os.path.join(str(cfg.get("test_data_dir", "")),
                                 img_key.strip())
            if os.path.exists(ipath):
                line_acond = image_acond(ipath)
            else:
                logger.warning("appearance image %r missing — using the "
                               "static subject embedding", ipath)
        logger.info("[%d] dreamvideo sampling %r", idx, caption)
        # textual-inversion text features through the custom embedder
        y_words = custom_embedder(text=[caption], embedding_manager=manager)
        key, sub = jax.random.split(key)
        t0 = time.time()
        frames = jax.block_until_ready(
            generate(unet_params, autoencoder.params, y_words,
                     zero_y_negative, line_acond, inverse_noise,
                     jnp.float32(inv_strength), sub))
        dt = time.time() - t0
        cap_name = re.sub(r"[^\w\s]", "", caption).replace(" ", "_")[:80]
        path = osp.join(save_dir, f"rank{rank:02d}_{idx:04d}_{cap_name}.mp4")
        written = save_video(np.asarray(frames), path,
                             fps=int(cfg.get("target_fps", 8)),
                             mean=cfg.mean, std=cfg.std)
        logger.info("sampled in %.2fs -> %s", dt, written)
        outputs.append(written)
    logger.info("Congratulations! The inference is completed!")
    return outputs
