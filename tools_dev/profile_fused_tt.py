"""Fused TemporalTransformer kernel vs the flax/XLA path, on-chip.

Per-TT comparison at the base-workload hot shapes (448x256 latents,
16 frames, batch 2 incl. CFG), then the whole UNet forward with the
fusion toggled. Baseline: TT full 6.5 ms at c320 (~38 TF/s),
tools_dev/profile_tt_parts.py.

Run: python tools_dev/profile_fused_tt.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import vgen_tpu  # noqa: F401
from vgen_tpu.models import blocks
from vgen_tpu.models.blocks import TemporalTransformer


def bench(name, fn, *args, n=50, flops=0.0):
    @jax.jit
    def many(*a):
        def step(x, _):
            o = fn(x, *a[1:])
            return (a[0] + o.astype(jnp.float32).mean() * 1e-6).astype(
                x.dtype), ()
        out, _ = jax.lax.scan(step, a[0], None, length=n)
        return out

    o = many(*args)
    _ = float(np.asarray(o.astype(jnp.float32).mean()))
    t0 = time.time()
    o = many(*args)
    _ = float(np.asarray(o.astype(jnp.float32).mean()))
    dt = (time.time() - t0) / n
    eff = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:40s}: {dt * 1e3:6.2f} ms{eff}", flush=True)
    return dt


# (B, F, H, W, C, heads): the TT instances of the base UNet at 448x256,
# plus the i2vgen 720p shapes (1280x704 latents, sequential CFG b1) —
# c640 at BHW 3520 routes through the SPLIT kernels, never separately
# benchmarked before r5 (VERDICT r4 weak #3: 720p throughput regressed
# 0.481 -> 0.47 builder-side and the split path was the suspect).
SHAPES = [
    (2, 16, 32, 56, 320, 5),    # 4x in the model (enc x2 + dec x3 - init)
    (2, 16, 16, 28, 640, 10),   # 5x
    (2, 16, 8, 14, 1280, 20),   # 5x (XLA path — fusion off above 640)
    (1, 16, 88, 160, 320, 5),   # 720p scale-1 (BHW 14080, mega kernel)
    (1, 16, 44, 80, 640, 10),   # 720p scale-2 (BHW 3520, split kernels)
]


def per_tt():
    for b, f, h, w, c, heads in SHAPES:
        x = (jax.random.normal(jax.random.PRNGKey(0), (b, f, h, w, c))
             * 0.5).astype(jnp.bfloat16)
        tt = TemporalTransformer(heads=heads, dim_head=64,
                                 deterministic=True, dtype=jnp.bfloat16)
        blocks.FUSED_TT = "off"
        p = jax.jit(lambda: tt.init(jax.random.PRNGKey(1), x))()
        # flops: 2 attn (4 proj) + FF (8C + 4C->C) + proj in/out + attention
        t_tokens = b * h * w * f
        fl = (2 * t_tokens * c * c * (4 * 2 + 2)
              + 2 * t_tokens * c * 8 * c + 2 * t_tokens * 4 * c * c
              + 2 * 4 * b * h * w * heads * f * f * 64)
        for mode in ("off", "auto"):
            blocks.FUSED_TT = mode
            bench(f"TT c{c} [{b},{f},{h},{w}] fused={mode}",
                  lambda xx, pp: tt.apply(pp, xx), x, p, flops=fl)
        blocks.FUSED_TT = "auto"


def unet_fwd():
    from vgen_tpu.core import MODEL, default_cfg
    cfg = default_cfg()
    cfg.UNet = dict(cfg.UNet, type="UNetSD_T2VBase", out_dim=4)
    model = MODEL.build(dict(cfg.UNet), dtype=jnp.bfloat16)
    f, lh, lw = 16, 32, 56
    x0 = jnp.zeros((1, 2, lh, lw, 4))
    t0 = jnp.zeros((1,), jnp.int32)
    y0 = jnp.zeros((1, 77, 1024))
    blocks.FUSED_TT = "off"
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x0, t0,
                                        y=y0))()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, f, lh, lw, 4))
    t = jnp.full((2,), 500, jnp.int32)
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 1024)) * 0.02

    outs = {}
    for mode in ("off", "auto"):
        blocks.FUSED_TT = mode
        fwd = jax.jit(lambda p, xx, tt, yy: model.apply(p, xx, tt, y=yy))
        c = fwd.lower(params, x, t, y).compile()
        fl = c.cost_analysis()
        fl = (fl[0] if isinstance(fl, (list, tuple)) else fl).get("flops", 0)
        jax.block_until_ready(c(params, x, t, y))
        t0_ = time.time()
        n = 10
        for _ in range(n):
            o = c(params, x, t, y)
        jax.block_until_ready(o)
        dt = (time.time() - t0_) / n
        outs[mode] = np.asarray(o, np.float32)
        print(f"UNet fwd b2 16f 448x256 fused={mode:4s}: {dt*1e3:.1f} ms "
              f"({fl/dt/1e12:.1f} TF/s)", flush=True)
    err = np.abs(outs["off"] - outs["auto"]).max() / max(
        np.abs(outs["off"]).max(), 1e-6)
    print(f"fused-vs-unfused UNet output rel err: {err:.4f}", flush=True)


if __name__ == "__main__":
    per_tt()
    unet_fwd()
