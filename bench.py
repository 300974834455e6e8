"""Benchmark: seconds per 16-frame 448x256 video, DDIM-50 with CFG.

The BASELINE.json headline metric (t2v_infer.yaml path): full-size
ModelScope-T2V UNet (~1.4B params), CLIP-conditioned CFG-DDIM 50 steps +
chunked VAE decode as ONE compiled program, on the real TPU chip.
Weights are random (no released checkpoints in this environment) —
throughput is weight-independent.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the reference's only published claim
("a few minutes" per video on GPU, README.MD:168) — reported as the
ratio vs 180 s (the conservative 'few minutes' reading).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    import vgen_tpu  # noqa: F401
    from vgen_tpu.core import DIFFUSION, MODEL, default_cfg
    from vgen_tpu.engines.infer_t2v import make_generate_fn
    from vgen_tpu.core.config import AttrDict
    from vgen_tpu.core import AUTO_ENCODER

    cfg = default_cfg()
    cfg.update({
        "max_frames": int(os.environ.get("BENCH_FRAMES", 16)),
        "resolution": [448, 256],
        "scale": 8,
        "guide_scale": 9.0,
        "ddim_timesteps": 50,
        "decoder_bs": 8,
    })
    cfg.UNet = dict(cfg.UNet, type="UNetSD_T2VBase", out_dim=4)
    dtype = None if os.environ.get("BENCH_F32") else jnp.bfloat16

    model = MODEL.build(dict(cfg.UNet), dtype=dtype)
    autoencoder = AUTO_ENCODER.build(dict(cfg.auto_encoder), dtype=dtype)
    diffusion = DIFFUSION.build(dict(cfg.Diffusion))

    key = jax.random.PRNGKey(0)
    lat_h, lat_w = 256 // 8, 448 // 8
    x0 = jnp.zeros((1, 2, lat_h, lat_w, 4))
    t0 = jnp.zeros((1,), jnp.int32)
    y0 = jnp.zeros((1, 77, 1024))
    unet_params = jax.jit(lambda: model.init(key, x0, t0, y=y0))()
    autoencoder.init_random(jax.random.PRNGKey(1), image_size=64)

    generate = make_generate_fn(cfg, model, autoencoder, diffusion)
    y = jnp.zeros((1, 77, 1024), jnp.float32)
    yn = jnp.zeros((1, 77, 1024), jnp.float32)
    fps = jnp.asarray([16], jnp.int32)

    t0_ = time.time()
    frames = jax.block_until_ready(
        generate(unet_params, autoencoder.params, y, yn, fps,
                 jax.random.PRNGKey(2)))
    compile_s = time.time() - t0_

    n = int(os.environ.get("BENCH_ITERS", 3))
    t0_ = time.time()
    for i in range(n):
        frames = jax.block_until_ready(
            generate(unet_params, autoencoder.params, y, yn, fps,
                     jax.random.PRNGKey(3 + i)))
    sec_per_video = (time.time() - t0_) / n

    baseline_s = 180.0  # reference "a few minutes"/video claim, README.MD:168
    print(json.dumps({
        "metric": "sec per 16-frame 448x256 video (DDIM-50, CFG, incl. VAE decode)",
        "value": round(sec_per_video, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / sec_per_video, 2),
    }))
    # context line on stderr-like secondary output
    import sys
    print(f"# compile {compile_s:.0f}s, out shape {frames.shape}, "
          f"device {jax.devices()[0]}", file=sys.stderr)


if __name__ == "__main__":
    main()
