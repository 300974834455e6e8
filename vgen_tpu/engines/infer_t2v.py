"""inference_text2video_entrance — ModelScope-T2V / TF-T2V text-to-video.

TPU-native re-implementation of the reference engine
(reference: tools/inferences/inference_text2video_entrance.py). Same
flow — merge vldm_cfg, build CLIP/VAE/UNet/diffusion via registries, load
``test_model``, iterate the prompt list x rounds, save mp4 — with the
engine room redesigned for XLA:

  * ONE jitted program per (shape) covers the whole video: noise -> 50-step
    DDIM scan -> chunked VAE decode; latents stay HBM-resident end to end.
  * Classifier-free guidance batches cond/uncond into a single UNet call
    (batch 2) instead of two sequential model calls per step
    (reference diffusion_ddim.py:156-158).
  * No mp.spawn/NCCL: on TPU each host process drives its local devices;
    prompt-level parallelism shards the prompt list across jax processes
    (reference rank-offset behavior, :94).
"""

from __future__ import annotations

import logging
import os
import os.path as osp
import re
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import blocks
from ..core import (AUTO_ENCODER, DIFFUSION, EMBEDDER, INFER_ENGINE, MODEL,
                    assign_signle_cfg, default_cfg, merge_update, setup_logging,
                    setup_seed)
from ..data.video_io import save_video
from ..utils.ckpt import load_model_weights

logger = logging.getLogger(__name__)


def model_init_kwargs(cfg, lat_h: int, lat_w: int, frames: int = 2) -> dict:
    """Condition inputs each model family needs at init so every stem's
    parameters materialize (flax creates params lazily on first use)."""
    utype = cfg.UNet["type"]
    in_dim = cfg.UNet["in_dim"]
    kw = {}
    if "I2VGen" in utype:
        kw = dict(local_image=jnp.zeros((1, 1, lat_h, lat_w, in_dim)),
                  image=jnp.zeros((1, cfg.UNet.get("y_dim", 1024))))
    elif "HiGen" in utype:
        kw = dict(spat_prior=jnp.zeros((1, lat_h, lat_w, in_dim)),
                  motion_cond=jnp.zeros((1, frames), jnp.int32),
                  appearance_cond=jnp.zeros((1, frames, 32)))
    elif "DreamVideo" in utype:
        cd = cfg.UNet.get("temporal_adapter_condition_dim")
        if cd:
            kw = dict(adapter_condition=jnp.zeros((1, cd)))
    elif "TFT2V" in utype or "VideoLCM" in utype:
        comps = cfg.UNet.get("video_compositions",
                             cfg.get("video_compositions", []))
        px = (1, frames, int(cfg.resolution[1]), int(cfg.resolution[0]))
        chans = {"depthmap": ("depth", 1), "motion": ("motion", 2),
                 "canny": ("canny", 1), "mask": ("masked", 4),
                 "sketch": ("sketch", 1), "single_sketch": ("single_sketch", 1),
                 "local_image": ("local_image", 3)}
        for comp, (arg, c) in chans.items():
            if comp in comps:
                kw[arg] = jnp.zeros(px + (c,))
        if "image" in comps:
            kw["image"] = jnp.zeros((1, 1, cfg.UNet.get("context_dim", 1024)))
        if "histogram" in comps:
            kw["histogram"] = jnp.zeros((1, frames,
                                         cfg.UNet.get("hist_dim", 156)))
        if "VideoLCM" in utype:
            kw["t_w"] = jnp.zeros((1, cfg.UNet.get("dim", 320)))
    return kw


def build_t2v_models(cfg, key):
    """Build + initialize (CLIP, VAE, UNet module, UNet params, diffusion).

    Weights come from cfg.test_model via the torch-checkpoint importer;
    missing checkpoints fall back to random init with a loud warning so
    the pipeline stays runnable for smoke tests and benchmarks.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    # use_fp16 in the reference selects fp16 autocast; on TPU it selects
    # bf16 compute (f32 params) — no GradScaler needed (SURVEY §2.9)
    dtype = jnp.bfloat16 if cfg.get("use_fp16") else None

    clip_encoder = EMBEDDER.build(dict(cfg.embedder), dtype=dtype)
    clip_encoder.init_random(k1)

    autoencoder = AUTO_ENCODER.build(dict(cfg.auto_encoder), dtype=dtype)
    autoencoder.init_random(k2, image_size=64)

    ucfg = dict(cfg.UNet)
    if "TFT2V" in ucfg["type"] or "VideoLCM" in ucfg["type"]:
        # video_compositions/resolution live at the top level of the yaml
        # (the reference passes the whole cfg object, unet_tf2tv.py:257)
        ucfg.setdefault("video_compositions",
                        list(cfg.get("video_compositions", ["text"])))
        ucfg.setdefault("resolution", list(cfg.resolution))
        cfg.UNet = ucfg
    model = MODEL.build(ucfg, dtype=dtype)
    lat_h = int(cfg.resolution[1]) // int(cfg.get("scale", 8))
    lat_w = int(cfg.resolution[0]) // int(cfg.get("scale", 8))
    x0 = jnp.zeros((1, 2, lat_h, lat_w, cfg.UNet["in_dim"]))
    t0 = jnp.zeros((1,), jnp.int32)
    y0 = jnp.zeros((1, 77, cfg.UNet["context_dim"]))
    init_kwargs = model_init_kwargs(cfg, lat_h, lat_w, frames=2)
    # jit the init: eager tracing dispatches each initializer op
    # individually (~8 min for the 1.4B UNet through the TPU tunnel)
    unet_params = jax.jit(lambda k: model.init(
        k, x0, t0, y=y0, **init_kwargs))(k3)

    test_model = cfg.get("test_model")
    if test_model and os.path.exists(test_model):
        unet_params, clip_encoder, autoencoder = load_model_weights(
            test_model, cfg, unet_params, clip_encoder, autoencoder)
    else:
        logger.warning(
            "test_model %r not found — running with RANDOM weights "
            "(smoke/benchmark mode; outputs are noise)", test_model)

    if dtype is not None:
        # inference-only: the bf16-compute modules cast every param to
        # bf16 per-op anyway, so f32 storage is pure HBM waste (5.6 GB
        # for the 1.4B UNet — the difference between fitting 720p on one
        # chip or not). Numerically identical to f32 storage + cast.
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, t)
        unet_params = cast(unet_params)
        autoencoder.params = cast(autoencoder.params)
        clip_encoder.params = cast(clip_encoder.params)

    diffusion = DIFFUSION.build(dict(cfg.Diffusion))
    return clip_encoder, autoencoder, model, unet_params, diffusion


def make_generate_fn(cfg, model, autoencoder, diffusion):
    """The fused noise->DDIM->decode program. jit once per latent shape."""
    f = int(cfg.max_frames)
    lat_h = int(cfg.resolution[1]) // int(cfg.get("scale", 8))
    lat_w = int(cfg.resolution[0]) // int(cfg.get("scale", 8))
    in_dim = cfg.UNet["in_dim"]
    guide_scale = float(cfg.guide_scale)
    ddim_steps = int(cfg.get("ddim_timesteps", 50))
    scale_factor = float(cfg.scale_factor)
    decoder_bs = int(cfg.get("decoder_bs", 8))
    chunk = decoder_bs if f % decoder_bs == 0 else f

    # batched CFG at base resolution; sequential two calls above 4096
    # spatial tokens where batch-2 skip activations OOM one chip
    # (see infer_i2vgen note; the reference always runs two calls)
    seq_cfg = bool(cfg.get("sequential_cfg", lat_h * lat_w > 4096))
    # multi-chip: shard the latent height over all devices
    # (use_zero_infer analog — reference configs set it for big runs)
    from ..parallel.mesh import constrain_spatial, spatial_infer_mesh
    sp_mesh = spatial_infer_mesh() if cfg.get("use_zero_infer") else None

    @partial(jax.jit, static_argnums=())
    def generate(unet_params, vae_params, y_words, y_negative, fps, key):
        def model_fn(xt, t):
            from ..ops.attention import spatial_shard_ctx
            xt = constrain_spatial(xt, sp_mesh)
            tb = jnp.broadcast_to(t, (xt.shape[0],)) if t.ndim == 0 else t
            with spatial_shard_ctx(sp_mesh):
                if seq_cfg:
                    y_out = model.apply(unet_params, xt, tb, y=y_words,
                                        fps=fps)
                    u_out = model.apply(unet_params, xt, tb, y=y_negative,
                                        fps=fps)
                else:
                    x2 = jnp.concatenate([xt, xt], axis=0)
                    t2 = jnp.concatenate([tb, tb], axis=0)
                    ctx = jnp.concatenate([y_words, y_negative], axis=0)
                    fps2 = jnp.concatenate([fps, fps], axis=0)
                    out = model.apply(unet_params, x2, t2, y=ctx, fps=fps2)
                    y_out, u_out = jnp.split(out, 2, axis=0)
            return diffusion.classifier_free_guidance(y_out, u_out, guide_scale)

        knoise, ksample = jax.random.split(key)
        noise = jax.random.normal(knoise, (1, f, lat_h, lat_w, in_dim),
                                  jnp.float32)
        latents = diffusion.ddim_sample_loop(
            ksample, noise, model_fn, ddim_timesteps=ddim_steps, eta=0.0)
        latents = latents / scale_factor

        # chunked VAE decode (reference decoder_bs chunks, :210-216)
        lat_frames = latents[0]  # [f, lh, lw, c]
        lat_chunks = lat_frames.reshape(f // chunk, chunk, lat_h, lat_w, in_dim)
        frames = jax.lax.map(
            lambda z: autoencoder.module.apply(vae_params, z,
                                               method="decode_latent"),
            lat_chunks)
        return frames.reshape(f, lat_h * 8, lat_w * 8, -1)

    return generate


@INFER_ENGINE.register_function()
def inference_text2video_entrance(cfg_update, **kwargs):
    cfg = merge_update(default_cfg(), cfg_update)
    cfg = assign_signle_cfg(cfg, cfg_update, "vldm_cfg")
    for k, v in (cfg_update or {}).items():  # infer yaml wins over train yaml
        cfg[k] = v

    exp_name = osp.basename(str(cfg.test_list_path)).split(".")[0]
    save_dir = osp.join(str(cfg.log_dir), exp_name)
    os.makedirs(save_dir, exist_ok=True)

    rank = jax.process_index()
    setup_logging(save_dir, rank=rank)
    key = setup_seed(int(cfg.seed) + rank)
    blocks.set_fused_tt(None)  # restore env default (trainers turn it off)

    logger.info("devices: %s", jax.devices())
    t_build = time.time()
    clip_encoder, autoencoder, model, unet_params, diffusion = \
        build_t2v_models(cfg, key)
    generate = make_generate_fn(cfg, model, autoencoder, diffusion)
    logger.info("models built in %.1fs", time.time() - t_build)

    # empty + negative prompt embeddings (reference :138-140)
    _, _, zero_y_negative = clip_encoder(text=[str(cfg.negative_prompt)])

    with open(cfg.test_list_path) as fh:
        test_list = [line.strip() for line in fh if line.strip()]
    # prompt-count cap (reference instructvideo eval: webvid_test_caps,
    # inference_instructvideo_entrance.py:196)
    if cfg.get("test_caps"):
        test_list = test_list[:int(cfg.test_caps)]
    num_videos = len(test_list)
    test_list = [item for item in test_list for _ in range(int(cfg.get("round", 1)))]

    fps_tensor = jnp.asarray([int(cfg.target_fps)], jnp.int32)
    outputs = []
    for idx, caption in enumerate(test_list):
        if caption.startswith("#") or caption == "":
            logger.info("skip %r", caption)
            continue
        # prompt-level parallelism across processes (reference seeds by
        # rank; here each process takes a strided slice)
        if idx % jax.process_count() != rank:
            continue
        logger.info("[%d]/[%d] sampling %r", idx, num_videos, caption)
        _, _, y_words = clip_encoder(text=[caption])

        t0 = time.time()
        key, sub = jax.random.split(key)
        frames = generate(unet_params, autoencoder.params, y_words,
                          zero_y_negative, fps_tensor, sub)
        frames = jax.block_until_ready(frames)
        dt = time.time() - t0

        cap_name = re.sub(r"[^\w\s]", "", caption).replace(" ", "_")[:80]
        path = osp.join(save_dir, f"rank{rank:02d}_{idx:04d}_{cap_name}.mp4")
        written = save_video(np.asarray(frames), path,
                             fps=int(cfg.target_fps),
                             mean=cfg.mean, std=cfg.std)
        logger.info("sampled in %.2fs -> %s", dt, written)
        outputs.append(written)

    logger.info("Congratulations! The inference is completed!")
    return outputs
