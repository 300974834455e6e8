"""Segmented (host-driven) execution must equal the single-program path.

At 720p one fused denoise program is a multi-minute device execution —
longer than device watchdogs allow — so engines split the chain into
short segments (infer_i2vgen / infer_sr600, exec_segment_steps). The
math must be IDENTICAL: same steps, same noise stream consumption.
"""

import jax
import jax.numpy as jnp
import numpy as np

import vgen_tpu  # noqa: F401
from vgen_tpu.core import AUTO_ENCODER, DIFFUSION, MODEL
from vgen_tpu.core.config import AttrDict
import pytest


def _tiny_cfg(**over):
    cfg = AttrDict({
        "max_frames": 2, "resolution": [32, 32], "scale": 8,
        "guide_scale": 3.0, "ddim_timesteps": 6, "decoder_bs": 2,
        "scale_factor": 0.18215, "use_zero_infer": False,
        "chunk_size": 2,
        "UNet": {"type": "UNetSD_I2VGen", "in_dim": 4, "dim": 16,
                 "y_dim": 32, "context_dim": 32, "concat_dim": 4,
                 "out_dim": 4, "dim_mult": [1], "num_heads": 2,
                 "head_dim": 8, "num_res_blocks": 1, "attn_scales": [1.0],
                 "dropout": 0.0, "temporal_attention": True,
                 "use_checkpoint": False},
        "auto_encoder": {"type": "AutoencoderKL",
                         "ddconfig": {"double_z": True, "z_channels": 4,
                                      "resolution": 32, "in_channels": 3,
                                      "out_ch": 3, "ch": 32,
                                      "ch_mult": [1, 1, 1, 1],
                                      "num_res_blocks": 1,
                                      "attn_resolutions": [],
                                      "dropout": 0.0},
                         "embed_dim": 4, "pretrained": ""},
        "Diffusion": {"type": "DiffusionDDIM", "schedule": "linear_sd",
                      "schedule_param": {"num_timesteps": 60,
                                         "init_beta": 0.00085,
                                         "last_beta": 0.012},
                      "mean_type": "v", "var_type": "fixed_small",
                      "loss_type": "mse", "noise_strength": 0.0},
    })
    cfg.update(over)
    return cfg


def _build(cfg):
    from vgen_tpu.engines.infer_t2v import model_init_kwargs

    model = MODEL.build(dict(cfg.UNet))
    autoencoder = AUTO_ENCODER.build(dict(cfg.auto_encoder))
    autoencoder.init_random(jax.random.PRNGKey(1), image_size=32)
    diffusion = DIFFUSION.build(dict(cfg.Diffusion))
    lh = lw = 32 // 8
    ikw = model_init_kwargs(cfg, lh, lw, frames=2)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, lh, lw, 4)),
                        jnp.zeros((1,), jnp.int32),
                        y=jnp.zeros((1, 77, 32)), **ikw)
    return model, autoencoder, diffusion, params


@pytest.mark.slow
def test_i2vgen_segmented_equals_whole():
    from vgen_tpu.engines.infer_i2vgen import make_i2vgen_generate_fn

    cfg = _tiny_cfg()
    model, autoencoder, diffusion, params = _build(cfg)

    gen_whole = make_i2vgen_generate_fn(
        _tiny_cfg(exec_segment_steps=0), model, autoencoder, diffusion)
    gen_seg = make_i2vgen_generate_fn(
        _tiny_cfg(exec_segment_steps=4), model, autoencoder, diffusion)

    img = jnp.zeros((1, 32, 32, 3))
    y = 0.1 * jnp.ones((1, 77, 32))
    yv = jnp.zeros((1, 32))
    yn = jnp.zeros((1, 77, 32))
    fps = jnp.asarray([8], jnp.int32)
    key = jax.random.PRNGKey(5)

    a = gen_whole(params, autoencoder.params, img, y, yv, yn, fps, key)
    b = gen_seg(params, autoencoder.params, img, y, yv, yn, fps, key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_sr600_segmented_equals_whole():
    from vgen_tpu.engines.infer_sr600 import make_sr_fn

    sr_diff = {"type": "DiffusionDDIMSR",
               "reverse_diffusion": {"schedule": "cosine", "mean_type": "v",
                                     "schedule_param": {"num_timesteps": 60,
                                                        "zero_terminal_snr": True}},
               "forward_diffusion": {"schedule": "logsnr_cosine_interp",
                                     "mean_type": "v",
                                     "schedule_param": {"num_timesteps": 60,
                                                        "zero_terminal_snr": True,
                                                        "scale_min": 2.0,
                                                        "scale_max": 4.0}}}
    ucfg = {"type": "UNetSD_SR600", "in_dim": 4, "dim": 16, "y_dim": 32,
            "context_dim": 32, "out_dim": 4, "dim_mult": [1],
            "num_heads": 2, "head_dim": 8, "num_res_blocks": 1,
            "attn_scales": [1.0], "use_scale_shift_norm": True,
            "dropout": 0.0, "temporal_attention": True,
            "use_checkpoint": False, "inpainting": True}
    cfg = _tiny_cfg(UNet=ucfg, Diffusion=sr_diff, total_noise_levels=40,
                    sr_steps=6)
    model, autoencoder, diffusion, params = _build(cfg)

    sr_whole = make_sr_fn(_tiny_cfg(UNet=ucfg, Diffusion=sr_diff,
                                    total_noise_levels=40, sr_steps=6,
                                    exec_segment_steps=0),
                          model, autoencoder, diffusion)
    sr_seg = make_sr_fn(_tiny_cfg(UNet=ucfg, Diffusion=sr_diff,
                                  total_noise_levels=40, sr_steps=6,
                                  exec_segment_steps=4),
                        model, autoencoder, diffusion)

    lh = lw = 4
    latents = 0.2 * jax.random.normal(jax.random.PRNGKey(2),
                                      (1, 2, lh, lw, 4))
    y = 0.1 * jnp.ones((1, 77, 32))
    zy = jnp.zeros((1, 77, 32))
    key = jax.random.PRNGKey(9)

    a = sr_whole(params, autoencoder.params, latents, y, zy, key)
    b = sr_seg(params, autoencoder.params, latents, y, zy, key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-4)
