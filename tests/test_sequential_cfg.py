"""sequential_cfg (two guidance calls) must equal batched CFG exactly —
same params, same noise key, same DDIM trajectory."""

import jax
import jax.numpy as jnp
import numpy as np
import yaml

import vgen_tpu  # noqa: F401
import vgen_tpu.engines  # noqa: F401
from vgen_tpu.core import merge_update, default_cfg
import pytest


def _cfg(**over):
    with open("configs/t2v_infer_tiny.yaml") as fh:
        raw = yaml.safe_load(fh)
    cfg = merge_update(default_cfg(), raw)
    for k, v in over.items():
        cfg[k] = v
    return cfg


@pytest.mark.slow
def test_sequential_equals_batched_cfg():
    from vgen_tpu.engines.infer_t2v import build_t2v_models, make_generate_fn

    key = jax.random.PRNGKey(0)
    cfg = _cfg(max_frames=2, ddim_timesteps=3, resolution=[32, 32])
    clip_encoder, autoencoder, model, unet_params, diffusion = \
        build_t2v_models(cfg, key)
    _, _, y = clip_encoder(text=["a test"])
    _, _, zero_y = clip_encoder(text=[""])
    fps = jnp.asarray([8], jnp.int32)

    outs = {}
    for mode in (False, True):
        cfg["sequential_cfg"] = mode
        gen = make_generate_fn(cfg, model, autoencoder, diffusion)
        outs[mode] = np.asarray(gen(unet_params, autoencoder.params, y,
                                    zero_y, fps, jax.random.PRNGKey(7)))
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-5,
                               atol=1e-5)
