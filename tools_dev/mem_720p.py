"""Compile the 720p i2vgen generate program and print XLA memory stats
(no execution) to find the OOM source."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import yaml

import vgen_tpu  # noqa: F401
import vgen_tpu.engines  # noqa: F401
from vgen_tpu.core import default_cfg, merge_update, assign_signle_cfg
from vgen_tpu.engines.infer_i2vgen import make_i2vgen_generate_fn
from vgen_tpu.engines.infer_t2v import build_t2v_models


def main():
    with open("configs/i2vgen_xl_infer.yaml") as fh:
        raw = yaml.safe_load(fh)
    cfg = merge_update(default_cfg(), raw)
    cfg = assign_signle_cfg(cfg, raw, "vldm_cfg")
    for k, v in raw.items():
        cfg[k] = v
    cfg["test_model"] = ""

    key = jax.random.PRNGKey(0)
    clip_encoder, autoencoder, model, unet_params, diffusion = \
        build_t2v_models(cfg, key)
    nbytes = sum(x.size * x.dtype.itemsize
                 for x in jax.tree.leaves(unet_params))
    print(f"# UNet param bytes: {nbytes/1e9:.2f} GB")

    gen = make_i2vgen_generate_fn(cfg, model, autoencoder, diffusion)
    f = int(cfg.max_frames)
    img = jnp.zeros((1, int(cfg.resolution[1]), int(cfg.resolution[0]), 3),
                    jnp.float32)
    y = jnp.zeros((1, 77, 1024), jnp.float32)
    yv = jnp.zeros((1, 1, 1024), jnp.float32)
    yn = jnp.zeros((1, 77, 1024), jnp.float32)
    fps = jnp.zeros((1,), jnp.int32)
    lowered = gen.lower(unet_params, autoencoder.params, img, y, yv, yn,
                        fps, key)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print(ma)


if __name__ == "__main__":
    main()
