"""Compile (no execution) the 720p hot programs and report XLA memory.

Emits ONE JSON line:
  {"programs": {name: {"temp_gb":..., "args_gb":..., "out_gb":...,
                       "total_gb":...}}, "limit_gb": ..., "ok": bool}

Exit code 1 if any program's temp+args+out exceeds --limit-gb
(default 15.2 — a 16 GB v5e chip minus runtime reserve). Used by
tests/test_mem_720p.py as the regression guard for the
sequential-CFG / segmented 720p execution design (VERDICT r1 #10).

Programs measured:
  * i2vgen_seg:  5-step sequential-CFG DDIM segment at [1,16,88,160,4]
                 (the stage-1 denoise program, infer_i2vgen.py)
  * i2vgen_dec:  chunked VAE decode at 1280x704
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import yaml


def mem_record(compiled):
    ma = compiled.memory_analysis()
    rec = {
        "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
        "args_gb": round(ma.argument_size_in_bytes / 1e9, 3),
        "out_gb": round(ma.output_size_in_bytes / 1e9, 3),
    }
    # aliased buffers (donated args) are counted in both args and out;
    # peak residency ~ args + temp + out - alias
    alias = getattr(ma, "alias_size_in_bytes", 0)
    rec["total_gb"] = round((ma.temp_size_in_bytes
                             + ma.argument_size_in_bytes
                             + ma.output_size_in_bytes - alias) / 1e9, 3)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit-gb", type=float, default=15.2)
    args = ap.parse_args()

    import vgen_tpu  # noqa: F401
    import vgen_tpu.engines  # noqa: F401
    from vgen_tpu.core import (assign_signle_cfg, default_cfg, merge_update)
    from vgen_tpu.engines.infer_t2v import build_t2v_models

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

    from vgen_tpu.engines.infer_i2vgen import make_i2vgen_generate_fn

    f = int(cfg.max_frames)
    lh = int(cfg.resolution[1]) // 8
    lw = int(cfg.resolution[0]) // 8

    # the ENGINE's actual compiled programs (exported by the factory) —
    # a hand-copied replica here would keep passing while the shipped
    # program regressed
    generate = make_i2vgen_generate_fn(cfg, model, autoencoder, diffusion)
    assert hasattr(generate, "denoise_segment"), \
        "expected the segmented engine path at 720p"
    n_seg = int(generate.segment_steps)

    xt = jnp.zeros((1, f, lh, lw, 4), jnp.float32)
    steps = jnp.zeros((n_seg,), jnp.int32)
    li = jnp.zeros((1, f, lh, lw, 4), jnp.float32)
    y = jnp.zeros((1, 77, 1024), jnp.float32)
    yn = jnp.zeros((1, 77, 1024), jnp.float32)
    yv = jnp.zeros((1, 1024), jnp.float32)
    fps = jnp.zeros((1,), jnp.int32)

    programs = {}
    seg = generate.denoise_segment.lower(
        unet_params, xt, steps, y, yv, yn, li, fps, key).compile()
    programs["i2vgen_seg"] = mem_record(seg)

    dec = generate.decode.lower(autoencoder.params, xt).compile()
    programs["i2vgen_dec"] = mem_record(dec)

    ok = all(p["total_gb"] < args.limit_gb for p in programs.values())
    print(json.dumps({"programs": programs, "limit_gb": args.limit_gb,
                      "ok": bool(ok),
                      "device": str(jax.devices()[0])}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
