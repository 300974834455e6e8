"""inference_i2vgen_entrance — I2VGen-XL image-to-video generation.

TPU-native re-implementation of the reference engine
(reference: tools/inferences/inference_i2vgen_entrance.py:52-250). Flow:
read "imgpath|||caption" lines, CLIP image+text embed (:185-189),
VAE-encode the first frame as local_image (:192-194), CFG-DDIM
(guide_scale 9.0, :214-220), chunked decode (:222-231), save mp4.

TPU redesign: the whole noise->DDIM->decode pipeline is one jitted
program; cond/uncond are batched into a single UNet call per step; the
uncond branch uses the zero (black) image feature when use_zero_infer
(:210-213). Device memory telemetry replaces pynvml (:197-200).
"""

from __future__ import annotations

import logging
import os
import os.path as osp
import re
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..models import blocks
from ..core import (AUTO_ENCODER, DIFFUSION, EMBEDDER, INFER_ENGINE, MODEL,
                    assign_signle_cfg, default_cfg, merge_update,
                    setup_logging, setup_seed)
from ..data import transforms as T
from ..data.video_io import save_video
from ..utils.ckpt import load_model_weights

logger = logging.getLogger(__name__)


def largest_divisor_at_most(n: int, k: int) -> int:
    """Largest divisor of n that is <= k (segment size picker: all
    segments share ONE compiled shape, no padding)."""
    k = max(min(int(k), n), 1)
    while n % k:
        k -= 1
    return k


def device_memory_gb() -> float:
    """TPU HBM usage (replaces pynvml, reference :197-200)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / 1024 ** 3
    except Exception:  # noqa: BLE001
        return float("nan")


def make_i2vgen_generate_fn(cfg, model, autoencoder, diffusion):
    f = int(cfg.max_frames)
    lat_h = int(cfg.resolution[1]) // int(cfg.get("scale", 8))
    lat_w = int(cfg.resolution[0]) // int(cfg.get("scale", 8))
    in_dim = cfg.UNet["in_dim"]
    guide_scale = float(cfg.guide_scale)
    ddim_steps = int(cfg.get("ddim_timesteps", 50))
    scale_factor = float(cfg.scale_factor)
    decoder_bs = int(cfg.get("decoder_bs", 8))
    chunk = decoder_bs if f % decoder_bs == 0 else f
    use_zero_infer = bool(cfg.get("use_zero_infer", True))
    highres = lat_h * lat_w > 4096
    # CFG execution: batched (cond+uncond in one call, best MXU
    # utilization) at base resolution; SEQUENTIAL two calls at high
    # resolution — at 1280x704 the UNet's live skip activations are
    # ~2.9 GB each at batch 2 and a single 16 GB chip OOMs, while
    # two batch-1 calls fit (the reference always runs two calls,
    # diffusion_ddim.py:157-158)
    seq_cfg = bool(cfg.get("sequential_cfg", highres))
    # segmented execution: at high resolution one 50-step program is a
    # multi-minute device call — split the chain into host-driven
    # segments (ONE compile; ~ms per boundary)
    seg = cfg.get("exec_segment_steps")
    seg = int(seg) if seg is not None else (5 if highres else 0)

    def make_model_fn(unet_params, y_words, y_visual, y_negative,
                      local_image, fps):
        zero_image = jnp.zeros_like(y_visual) if use_zero_infer else None
        uncond_image = zero_image if zero_image is not None else y_visual
        from ..parallel.mesh import constrain_spatial, spatial_infer_mesh
        sp_mesh = spatial_infer_mesh() if cfg.get("use_zero_infer") else None

        def model_fn(xt, t):
            from ..ops.attention import spatial_shard_ctx
            xt = constrain_spatial(xt, sp_mesh)
            tb = jnp.broadcast_to(t, (xt.shape[0],)) if t.ndim == 0 else t
            with spatial_shard_ctx(sp_mesh):
                if seq_cfg:
                    # sequential CFG as a length-2 lax.map so the UNet
                    # body is inlined ONCE (two separate .apply calls
                    # duplicate the whole 1.4B-param program: 2x the XLA
                    # code, ~2x the compile time — the r4 driver bench
                    # lost 3 records to exactly that compile tax)
                    ctx2 = jnp.stack([y_words, y_negative])
                    img2 = jnp.stack([y_visual, uncond_image])
                    y_out, u_out = jax.lax.map(
                        lambda c: model.apply(
                            unet_params, xt, tb, y=c[0], image=c[1],
                            local_image=local_image, fps=fps),
                        (ctx2, img2))
                else:
                    x2 = jnp.concatenate([xt, xt], axis=0)
                    t2 = jnp.concatenate([tb, tb], axis=0)
                    ctx = jnp.concatenate([y_words, y_negative], axis=0)
                    img = jnp.concatenate([y_visual, uncond_image], axis=0)
                    li = jnp.concatenate([local_image, local_image], axis=0)
                    fps2 = jnp.concatenate([fps, fps], axis=0)
                    out = model.apply(unet_params, x2, t2, y=ctx, image=img,
                                      local_image=li, fps=fps2)
                    y_out, u_out = jnp.split(out, 2, axis=0)
            return diffusion.classifier_free_guidance(y_out, u_out, guide_scale)

        return model_fn

    @jax.jit
    def encode_first_frame(vae_params, image_pixels, key):
        """first-frame latent, repeated over frames (reference :192-194)."""
        from ..models.autoencoder import DiagonalGaussianDistribution
        moments = autoencoder.module.apply(vae_params, image_pixels,
                                           method="encode_moments")
        local = DiagonalGaussianDistribution(moments).sample(key) * scale_factor
        return jnp.repeat(local[:, None], f, axis=1)  # [1,f,lh,lw,4]

    @jax.jit
    def decode(vae_params, latents):
        lat_frames = (latents / scale_factor)[0]
        lat_chunks = lat_frames.reshape(f // chunk, chunk, lat_h, lat_w,
                                        in_dim)
        frames = jax.lax.map(
            lambda z: autoencoder.module.apply(vae_params, z,
                                               method="decode_latent"),
            lat_chunks)
        return frames.reshape(f, lat_h * 8, lat_w * 8, -1)

    if not seg:
        @jax.jit
        def generate(unet_params, vae_params, image_pixels, y_words,
                     y_visual, y_negative, fps, key):
            """image_pixels: [1,H,W,3] normalized first frame."""
            kvae, knoise, ksample = jax.random.split(key, 3)
            local_image = encode_first_frame.__wrapped__(
                vae_params, image_pixels, kvae)
            model_fn = make_model_fn(unet_params, y_words, y_visual,
                                     y_negative, local_image, fps)
            noise = jax.random.normal(knoise, (1, f, lat_h, lat_w, in_dim),
                                      jnp.float32)
            latents = diffusion.ddim_sample_loop(
                ksample, noise, model_fn, ddim_timesteps=ddim_steps, eta=0.0)
            return decode.__wrapped__(vae_params, latents)

        return generate

    @jax.jit
    def denoise_segment(unet_params, xt, steps, y_words, y_visual,
                        y_negative, local_image, fps, key):
        model_fn = make_model_fn(unet_params, y_words, y_visual,
                                 y_negative, local_image, fps)
        return diffusion.ddim_sample_scan(key, xt, steps, model_fn,
                                          ddim_timesteps=ddim_steps, eta=0.0)

    def generate(unet_params, vae_params, image_pixels, y_words, y_visual,
                 y_negative, fps, key):
        """Host-driven segmented pipeline (same math, many short device
        executions)."""
        import numpy as np

        kvae, knoise, ksample = jax.random.split(key, 3)
        local_image = encode_first_frame(vae_params, image_pixels, kvae)
        xt = jax.random.normal(knoise, (1, f, lat_h, lat_w, in_dim),
                               jnp.float32)
        steps_all = np.asarray(diffusion.ddim_timestep_seq(ddim_steps))
        size = largest_divisor_at_most(len(steps_all), seg)
        n_seg = len(steps_all) // size
        seg_keys = jax.random.split(ksample, n_seg)
        for i in range(n_seg):
            sl = steps_all[i * size:(i + 1) * size]
            xt = denoise_segment(unet_params, xt, jnp.asarray(sl, jnp.int32),
                                 y_words, y_visual, y_negative, local_image,
                                 fps, seg_keys[i])
            xt = jax.block_until_ready(xt)
        return decode(vae_params, xt)

    # exported so memory/regression tooling compiles the ACTUAL shipped
    # programs, not replicas (tools_dev/mem_720p.py)
    generate.denoise_segment = denoise_segment
    generate.decode = decode
    generate.segment_steps = seg
    return generate


@INFER_ENGINE.register_function()
def inference_i2vgen_entrance(cfg_update, **kwargs):
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
    generate = make_i2vgen_generate_fn(cfg, model, autoencoder, diffusion)

    _, _, zero_y_negative = clip_encoder(text=[str(cfg.negative_prompt)])

    with open(cfg.test_list_path) as fh:
        test_list = [l.strip() for l in fh if l.strip()]
    num_videos = len(test_list)
    test_list = [item for item in test_list
                 for _ in range(int(cfg.get("round", 1)))]

    fps_tensor = jnp.asarray([int(cfg.target_fps)], jnp.int32)
    outputs = []
    for idx, line in enumerate(test_list):
        if line.startswith("#"):
            continue
        if idx % jax.process_count() != rank:
            continue
        img_key, _, caption = line.partition("|||")
        caption = caption.strip()
        if not caption:
            logger.info("caption is null for %s, skip", img_key)
            continue
        logger.info("[%d]/[%d] sampling %r + %r", idx, num_videos,
                    img_key, caption)

        image = Image.open(img_key.strip()).convert("RGB")
        img_u8 = np.asarray(image)
        # CLIP-space image (vit_trans, :186-189)
        vit_img = T.vit_transform(img_u8, tuple(cfg.vit_resolution))
        # VAE-space image (train_trans, :192)
        vae_img = T.video_transform(img_u8[None], tuple(cfg.resolution),
                                    cfg.mean, cfg.std)

        y_visual, _, y_words = clip_encoder(image=jnp.asarray(vit_img)[None],
                                            text=[caption])
        logger.info("device memory used %.2f GB", device_memory_gb())

        t0 = time.time()
        key, sub = jax.random.split(key)
        frames = generate(unet_params, autoencoder.params,
                          jnp.asarray(vae_img), y_words, y_visual,
                          zero_y_negative, fps_tensor, sub)
        frames = jax.block_until_ready(frames)
        dt = time.time() - t0

        img_name = osp.splitext(osp.basename(img_key.strip()))[0]
        cap_name = re.sub(r"[^\w\s]", "", caption).replace(" ", "_")[:60]
        path = osp.join(save_dir,
                        f"rank{rank:02d}_{idx:04d}_{img_name}_{cap_name}.mp4")
        written = save_video(np.asarray(frames), path,
                             fps=int(cfg.target_fps), mean=cfg.mean,
                             std=cfg.std)
        logger.info("sampled in %.2fs -> %s", dt, written)
        outputs.append(written)

    logger.info("Congratulations! The inference is completed!")
    return outputs
