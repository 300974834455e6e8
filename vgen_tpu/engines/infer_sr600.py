"""inference_sr600_entrance — 1280x720 video super-resolution.

TPU-native re-implementation of the reference SR engine
(reference: tools/inferences/inference_sr600_entrance.py:139-311).
SDEdit-style two-pass: read the low-res stage-1 mp4, bilinear-resize
frames to 720p (:117), VAE-encode in chunks (:126-134), DDIM-reverse the
latents to noise level ``total_noise_levels`` (700, 30 steps, :256-266),
then re-denoise with DPM-Solver++ 2M SDE (30 steps, guide 9.0, rescale
0.3, trailing discretization, :269-280), decode and save.

TPU redesign: the reverse loop + SDE solve + decode compile into one
program (two scans); CFG with guidance rescale batches cond/uncond into
a single UNet call via ``guided_out``.
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
from ..core import (AUTO_ENCODER, DIFFUSION, EMBEDDER, INFER_ENGINE, MODEL,
                    assign_signle_cfg, default_cfg, merge_update,
                    setup_logging, setup_seed)
from ..data.video_io import read_video_frames, save_video
from ..diffusion.gauss import guided_out
from ..utils.ckpt import load_model_weights

logger = logging.getLogger(__name__)


def load_lowres_latent_fn(cfg, autoencoder):
    """normalize -> bilinear 720p resize -> chunked VAE encode, one
    jitted program (reference load_video_frames + F.interpolate + chunked
    encode, :95-134). The resize runs ON DEVICE (the reference does it on
    GPU too, :117); frames arrive as uint8 at the stage-1 resolution —
    1/4 the host->device bytes of pre-normalized f32."""
    chunk = int(cfg.chunk_size)
    scale_factor = float(cfg.scale_factor)
    # the reference hard-codes the SR target: F.interpolate(size=(720,
    # 1280)) (inference_sr600_entrance.py:117) — default to that, NOT to
    # cfg.resolution (which would silently skip the upscale for configs
    # inheriting the 448x256 default)
    target = cfg.get("sr_resolution", [1280, 720])
    target_w, target_h = int(target[0]), int(target[1])
    mean = tuple(float(m) for m in cfg.get("mean", (0.5, 0.5, 0.5)))
    std = tuple(float(s) for s in cfg.get("std", (0.5, 0.5, 0.5)))

    @jax.jit
    def encode(vae_params, frames, key):
        from ..models.autoencoder import DiagonalGaussianDistribution
        f, h, w, c = frames.shape
        if frames.dtype == jnp.uint8:
            frames = frames.astype(jnp.float32) / 255.0
            frames = (frames - jnp.asarray(mean)) / jnp.asarray(std)
        if (h, w) != (target_h, target_w):
            # torch F.interpolate(bilinear, align_corners=False) semantics
            frames = jax.image.resize(
                frames, (f, target_h, target_w, c), "bilinear")
        h, w = target_h, target_w
        cs = chunk if f % chunk == 0 else f
        chunks = frames.reshape(f // cs, cs, h, w, c)
        moments = jax.lax.map(
            lambda x: autoencoder.module.apply(vae_params, x,
                                               method="encode_moments"),
            chunks).reshape(f, h // 8, w // 8, -1)
        z = DiagonalGaussianDistribution(moments).sample(key) * scale_factor
        return z[None]  # [1, f, lh, lw, 4]

    return encode


def make_sr_fn(cfg, model, autoencoder, diffusion):
    """renoise -> dpmpp solve -> decode. One jitted program at base
    resolution; host-driven SEGMENTS at 720p (one short device execution
    per segment — see infer_i2vgen.make_i2vgen_generate_fn)."""
    total_noise_levels = int(cfg.get("total_noise_levels", 700))
    guide_scale = 9.0
    guide_rescale = 0.3
    decoder_bs = int(cfg.get("decoder_bs", 4))
    scale_factor = float(cfg.scale_factor)
    sr_steps = int(cfg.get("sr_steps", 30))

    def uncond_fn_of(unet_params, zero_y):
        def uncond_fn(xt, t):
            return model.apply(unet_params, xt, t, y=jnp.broadcast_to(
                zero_y, (xt.shape[0],) + zero_y.shape[1:]))
        return uncond_fn

    def guided_fn_of(unet_params, y_words, zero_y, b, seq_cfg):
        def guided_fn(xt, t):
            yb = jnp.broadcast_to(y_words, (b,) + y_words.shape[1:])
            zb = jnp.broadcast_to(zero_y, (b,) + zero_y.shape[1:])
            if seq_cfg:
                # length-2 lax.map: ONE inlined UNet body instead of two
                # (halves program size + compile time; execution is
                # sequential, so peak memory matches the two-call form)
                y_out, u_out = jax.lax.map(
                    lambda c: model.apply(unet_params, xt, t, y=c),
                    jnp.stack([yb, zb]))
            else:
                x2 = jnp.concatenate([xt, xt], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                ctx = jnp.concatenate([yb, zb], axis=0)
                out = model.apply(unet_params, x2, t2, y=ctx)
                y_out, u_out = jnp.split(out, 2, axis=0)
            return guided_out(y_out, u_out, guide_scale, guide_rescale)
        return guided_fn

    @jax.jit
    def decode(vae_params, video):
        b, f, lh, lw, c = video.shape
        lat = (video / scale_factor)[0]
        cs = decoder_bs if f % decoder_bs == 0 else f
        chunks = lat.reshape(f // cs, cs, lh, lw, c)
        frames = jax.lax.map(
            lambda z: autoencoder.module.apply(vae_params, z,
                                               method="decode_latent"),
            chunks)
        return frames.reshape(f, lh * 8, lw * 8, -1)

    lat_hw = (int(cfg.resolution[1]) // 8) * (int(cfg.resolution[0]) // 8)
    # sequential CFG at SR resolution: 32 frames x 1280x720 latents
    # at batch 2 blow a single chip's HBM (see infer_i2vgen note)
    seq_cfg_default = lat_hw > 4096
    seg = cfg.get("exec_segment_steps")
    seg = int(seg) if seg is not None else (5 if lat_hw > 4096 else 0)

    if not seg:
        @jax.jit
        def super_resolve(unet_params, vae_params, latents, y_words,
                          zero_y, key):
            b = latents.shape[0]
            seq_cfg = bool(cfg.get("sequential_cfg", seq_cfg_default))
            # pass 1: deterministic DDIM inversion to level 700 (:256-266)
            noised = diffusion.reverse_diffusion.ddim_reverse_sample_loop(
                latents, uncond_fn_of(unet_params, zero_y),
                ddim_timesteps=sr_steps, reverse_steps=total_noise_levels)
            # pass 2: DPM-Solver++ 2M SDE from level 699 (:269-280)
            video = diffusion.forward_diffusion.sample(
                key, noised, guided_fn_of(unet_params, y_words, zero_y, b,
                                          seq_cfg),
                solver="dpmpp_2m_sde", steps=sr_steps,
                t_max=total_noise_levels - 1, t_min=0,
                discretization="trailing")
            return decode.__wrapped__(vae_params, video)

        return super_resolve

    # ---- segmented variant -------------------------------------------
    from .infer_i2vgen import largest_divisor_at_most

    @jax.jit
    def reverse_segment(unet_params, xt, steps, zero_y):
        return diffusion.reverse_diffusion.ddim_reverse_sample_scan(
            xt, steps, uncond_fn_of(unet_params, zero_y),
            ddim_timesteps=sr_steps, reverse_steps=total_noise_levels)

    @jax.jit
    def euler_start(unet_params, noised, y_words, zero_y, t0_int, sigma1):
        """inf-sigma Euler start of the zero-terminal-SNR trajectory
        (gauss.sample_dpmpp_2m_sde :329-338)."""
        b = noised.shape[0]
        seq_cfg = bool(cfg.get("sequential_cfg", seq_cfg_default))
        gf = guided_fn_of(unet_params, y_words, zero_y, b, seq_cfg)
        fwd = diffusion.forward_diffusion
        t = jnp.broadcast_to(t0_int, (b,))
        x0 = fwd.denoise(noised, t, None, gf)[-2]
        return x0 + sigma1 * noised

    @jax.jit
    def sde_segment(unet_params, carry, sig_i, sig_ip1, t_i, keys, y_words,
                    zero_y):
        from ..diffusion.gauss import dpmpp_2m_sde_scan, get_scalings
        b = carry[0].shape[0]
        seq_cfg = bool(cfg.get("sequential_cfg", seq_cfg_default))
        gf = guided_fn_of(unet_params, y_words, zero_y, b, seq_cfg)
        fwd = diffusion.forward_diffusion

        def denoise_to_x0(xt, t):
            return fwd.denoise(xt, t, None, gf)[-2]

        return dpmpp_2m_sde_scan(carry, sig_i, sig_ip1, t_i, keys,
                                 denoise_to_x0, eta=1.0)

    def super_resolve(unet_params, vae_params, latents, y_words, zero_y,
                      key):
        import numpy as np

        from ..diffusion.gauss import dpmpp_carry_init

        fwd = diffusion.forward_diffusion
        rev = diffusion.reverse_diffusion

        # pass 1 (segmented)
        steps_all = rev.reverse_steps_np(sr_steps, total_noise_levels)
        size = largest_divisor_at_most(len(steps_all), seg)
        xt = latents
        for i in range(0, len(steps_all), size):
            xt = jax.block_until_ready(reverse_segment(
                unet_params, xt, jnp.asarray(steps_all[i:i + size]), zero_y))

        # pass 2 (segmented): static trajectory precomputed host-side
        sigmas, _ = fwd.solver_trajectory(
            sr_steps, total_noise_levels - 1, 0, "trailing", None, True)
        t_for_sigma = np.asarray(
            [round(fwd.sigma_to_t_np(s)) for s in sigmas[:-1]], np.int32)
        n = len(sigmas) - 1
        start = 0
        if np.isinf(sigmas[0]):
            xt = jax.block_until_ready(euler_start(
                unet_params, xt, y_words, zero_y,
                jnp.asarray(int(t_for_sigma[0]), jnp.int32),
                jnp.asarray(float(sigmas[1]), jnp.float32)))
            start = 1
        else:
            # finite first sigma: scale to the trajectory start
            # (gauss.sample_dpmpp_2m_sde :338)
            xt = xt * float(sigmas[0])
        carry = dpmpp_carry_init(xt)
        num = n - start
        keys = jax.random.split(key, max(num, 1))
        size = largest_divisor_at_most(num, seg)
        for i in range(start, n, size):
            j = i - start
            carry = sde_segment(
                unet_params, carry,
                jnp.asarray(sigmas[i:i + size], jnp.float32),
                jnp.asarray(sigmas[i + 1:i + size + 1], jnp.float32),
                jnp.asarray(t_for_sigma[i:i + size], jnp.int32),
                keys[j:j + size], y_words, zero_y)
            carry = jax.block_until_ready(carry)
        return decode(vae_params, carry[0])

    return super_resolve


@INFER_ENGINE.register_function()
def inference_sr600_entrance(cfg_update, **kwargs):
    cfg = merge_update(default_cfg(), cfg_update)
    cfg = assign_signle_cfg(cfg, cfg_update, "vldm_cfg")
    for k, v in (cfg_update or {}).items():
        cfg[k] = v

    save_dir = osp.join(str(cfg.log_dir), "sr600")
    os.makedirs(save_dir, exist_ok=True)
    rank = jax.process_index()
    setup_logging(save_dir, rank=rank)
    key = setup_seed(int(cfg.seed) + rank)
    blocks.set_fused_tt(None)  # restore env default (trainers turn it off)

    from .infer_t2v import build_t2v_models
    clip_encoder, autoencoder, model, unet_params, diffusion = \
        build_t2v_models(cfg, key)
    encode_lowres = load_lowres_latent_fn(cfg, autoencoder)
    super_resolve = make_sr_fn(cfg, model, autoencoder, diffusion)

    # SR prompting: negative suffix as uncond, positive suffix appended
    # (reference :191, :238; configs/sr600_infer.yaml:16-17)
    negative = cfg.embedder.get("negative_prompt", cfg.negative_prompt)
    positive = cfg.embedder.get("positive_prompt", "")
    _, _, zero_y = clip_encoder(text=[str(negative)])

    with open(cfg.test_list_path) as fh:
        test_list = [l.strip() for l in fh if l.strip()]
    test_list = [item for item in test_list
                 for _ in range(int(cfg.get("round", 1)))]

    double_frames = bool(cfg.get("double_frames_sr", False))

    outputs = []
    for idx, line in enumerate(test_list):
        if line.startswith("#"):
            continue
        if idx % jax.process_count() != rank:
            continue
        caption, _, seed_str = line.partition("|")
        caption = caption.strip()
        if not caption:
            continue
        # low-res input: the stage-1 output for this caption (reference
        # derives the path from the caption, :242-245); allow explicit
        # "caption|||path" too
        if "|||" in line:
            caption, _, src = line.partition("|||")
            src = src.strip()
        else:
            cap_name = re.sub(r"[^\w\s]", "", caption).replace(" ", "_")
            src = osp.join(str(cfg.get("lowres_dir", cfg.log_dir)),
                           f"{cap_name}.mp4")
        if not osp.exists(src):
            logger.warning("low-res input %s missing — skip", src)
            continue
        logger.info("[%d] super-resolving %s", idx, src)

        frames_u8 = read_video_frames(src)
        if double_frames:  # x2 frames by repetition (reference :105-110)
            frames_u8 = np.repeat(frames_u8, 2, axis=0)
        # normalize + bilinear 720p resize happen ON DEVICE inside
        # encode_lowres (reference resizes on GPU too, :117)

        _, _, y_words = clip_encoder(text=[caption + positive])

        key, k1, k2 = jax.random.split(key, 3)
        t0 = time.time()
        latents = encode_lowres(autoencoder.params, jnp.asarray(frames_u8),
                                k1)
        hi = super_resolve(unet_params, autoencoder.params, latents,
                           y_words, zero_y, k2)
        hi = jax.block_until_ready(hi)
        dt = time.time() - t0
        if double_frames:
            hi = hi[::2]

        out_path = osp.join(save_dir, f"rank{rank:02d}_{idx:04d}_sr600.mp4")
        written = save_video(np.asarray(hi), out_path,
                             fps=int(cfg.get("target_fps", 8)),
                             mean=cfg.mean, std=cfg.std)
        logger.info("super-resolved in %.2fs -> %s", dt, written)
        outputs.append(written)

    logger.info("Congratulations! The inference is completed!")
    return outputs
