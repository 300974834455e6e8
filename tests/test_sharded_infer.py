"""Spatially-sharded inference (use_zero_infer) on the 8-device CPU
mesh must match single-device output exactly."""

import jax
import numpy as np
import yaml

import vgen_tpu  # noqa: F401
import vgen_tpu.engines  # noqa: F401
from vgen_tpu.core import default_cfg, merge_update
from vgen_tpu.parallel.mesh import spatial_infer_mesh
import pytest


def _cfg(**over):
    with open("configs/t2v_infer_tiny.yaml") as fh:
        raw = yaml.safe_load(fh)
    cfg = merge_update(default_cfg(), raw)
    for k, v in over.items():
        cfg[k] = v
    return cfg


def test_spatial_mesh_exists_on_virtual_devices():
    mesh = spatial_infer_mesh()
    assert mesh is not None and mesh.shape["sp"] == len(jax.devices())


@pytest.mark.slow
def test_sharded_generate_matches_single_device():
    import jax.numpy as jnp

    from vgen_tpu.engines.infer_t2v import (build_t2v_models,
                                            make_generate_fn)

    key = jax.random.PRNGKey(0)
    cfg = _cfg(max_frames=2, ddim_timesteps=3, resolution=[64, 64])
    clip_encoder, autoencoder, model, unet_params, diffusion = \
        build_t2v_models(cfg, key)
    _, _, y = clip_encoder(text=["a test"])
    _, _, zero_y = clip_encoder(text=[""])
    fps = jnp.asarray([8], jnp.int32)

    outs = {}
    for zero_infer in (False, True):
        cfg["use_zero_infer"] = zero_infer
        gen = make_generate_fn(cfg, model, autoencoder, diffusion)
        outs[zero_infer] = np.asarray(
            gen(unet_params, autoencoder.params, y, zero_y, fps,
                jax.random.PRNGKey(3)))
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-4,
                               atol=2e-4)
