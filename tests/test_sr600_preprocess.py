"""SR600 input preprocessing parity: the on-device uint8 -> normalize ->
bilinear-720p-resize path (infer_sr600.load_lowres_latent_fn) must match
the reference's host/GPU pipeline: ToTensor+Normalize then
torch.nn.functional.interpolate(mode='bilinear', align_corners=False)
(reference inference_sr600_entrance.py:115-117)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
import pytest


def test_uint8_normalize_resize_matches_torch_interpolate():
    rng = np.random.RandomState(0)
    f, h, w = 3, 88, 160          # small stand-in for 704x1280 -> 720p
    th, tw = 90, 160
    u8 = rng.randint(0, 256, size=(f, h, w, 3), dtype=np.uint8)
    mean = std = (0.5, 0.5, 0.5)

    # ours (the jitted encode body, pre-VAE)
    x = jnp.asarray(u8).astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    ours = jax.image.resize(x, (f, th, tw, 3), "bilinear")

    # reference: normalize in torch, F.interpolate NCHW bilinear
    t = torch.from_numpy(u8.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
    t = (t - 0.5) / 0.5
    ref = F.interpolate(t, size=(th, tw), mode="bilinear",
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_sr_target_defaults_to_720p():
    """A config WITHOUT sr_resolution must upscale to the reference's
    hard-coded (720, 1280) target (inference_sr600_entrance.py:117) —
    not to cfg.resolution. Shape-only via eval_shape (no compute)."""
    import vgen_tpu  # noqa: F401
    from vgen_tpu.core import AUTO_ENCODER, default_cfg
    from vgen_tpu.engines.infer_sr600 import load_lowres_latent_fn

    cfg = default_cfg()  # resolution defaults to [448, 256]
    cfg.update({"chunk_size": 2, "scale_factor": 0.18215})
    assert "sr_resolution" not in cfg or not cfg.get("sr_resolution")
    ae = AUTO_ENCODER.build(dict(cfg.auto_encoder))
    ae.init_random(jax.random.PRNGKey(0), image_size=64)
    encode = load_lowres_latent_fn(cfg, ae)

    frames = jax.ShapeDtypeStruct((4, 704, 1280, 3), jnp.uint8)
    out = jax.eval_shape(encode, ae.params, frames,
                         jax.random.PRNGKey(1))
    assert out.shape == (1, 4, 720 // 8, 1280 // 8, 4), out.shape
