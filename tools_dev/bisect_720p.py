"""Bisect the r5 720p denoise regression (0.47 -> 0.112 steps/s).

Times ONE i2vgen UNet forward at the 720p working shape (latents
[1,16,88,160,4], sequential-CFG batch 1 — reference
configs/i2vgen_xl_train.yaml:7) under the flag ladder that separates the
round-4 and round-5 code paths:

  r3   : FUSED_TT=off  FUSED_TCONV=off  GN_IMPL=flax   (pure XLA)
  r4   : FUSED_TT=auto FUSED_TCONV=off  GN_IMPL=flax   (fused TT only)
  +tcv : FUSED_TT=auto FUSED_TCONV=auto GN_IMPL=flax
  r5   : FUSED_TT=auto FUSED_TCONV=auto GN_IMPL=named  (current default)

Expected per-forward time at MFU 0.45 is ~1.0 s (92 TFLOP / 197 TF/s /
0.45); the r5 bench measured ~4.4 s/forward. Whichever rung jumps is the
regression.

Run: python tools_dev/bisect_720p.py          (real TPU)
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

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bench_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build():
    import yaml

    from vgen_tpu.core import MODEL, default_cfg
    cfg = default_cfg()
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs/i2vgen_xl_train.yaml")) as f:
        train = yaml.safe_load(f)
    cfg.UNet = dict(train["UNet"])
    model = MODEL.build(dict(cfg.UNet), dtype=jnp.bfloat16)
    f_, lh, lw = 16, 88, 160
    x0 = jnp.zeros((1, 2, lh, lw, 4))
    t0 = jnp.zeros((1,), jnp.int32)
    y0 = jnp.zeros((1, 77, 1024))
    ikw = dict(image=jnp.zeros((1, 1024)),
               local_image=jnp.zeros((1, 2, lh, lw, 4)),
               fps=jnp.asarray([16], jnp.int32))
    blocks.FUSED_TT = blocks.FUSED_TCONV = "off"

    def _init_bf16():
        # init + cast in ONE jit program: an eager tree-wide cast issues
        # ~1400 tiny ops through the tunnel (minutes of dispatch latency)
        p = model.init(jax.random.PRNGKey(0), x0, t0, y=y0, **ikw)
        return jax.tree.map(
            lambda v: v.astype(jnp.bfloat16)
            if v.dtype == jnp.float32 else v, p)

    params = jax.jit(_init_bf16)()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, f_, lh, lw, 4))
    t = jnp.full((1,), 500, jnp.int32)
    y = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 1024)) * 0.02
    li = jnp.zeros((1, f_, lh, lw, 4), jnp.float32)
    im = jnp.zeros((1, 1024), jnp.float32)
    fps = jnp.asarray([16], jnp.int32)
    return model, params, (x, t, y, im, li, fps)


LADDER = [
    ("r3_xla",      "off",  "off",  "flax"),
    ("r4_tt",       "auto", "off",  "flax"),
    ("r5_tt_tconv", "auto", "auto", "flax"),
    ("r5_default",  "auto", "auto", "named"),
]


def segment_phase(model, params, args):
    """Phase 2: 5-step DDIM segment, lax.map CFG (r5, halves program
    size) vs two explicit model.apply calls (r4 form). If phase 1 shows
    per-forward parity, this isolates a scan/map-structure cost."""
    from vgen_tpu.core import DIFFUSION, default_cfg
    cfg = default_cfg()
    diffusion = DIFFUSION.build(dict(cfg.Diffusion))
    x, t, y, im, li, fps = args
    y_neg = jnp.zeros_like(y)
    steps = jnp.asarray(
        np.asarray(diffusion.ddim_timestep_seq(50))[:5], jnp.int32)
    key = jax.random.PRNGKey(7)

    def seg(style):
        def run(p, xx):
            def model_fn(xc, tt_):
                tb = jnp.broadcast_to(tt_, (xc.shape[0],)) \
                    if tt_.ndim == 0 else tt_
                if style == "map":
                    y_out, u_out = jax.lax.map(
                        lambda c: model.apply(p, xc, tb, y=c[0], image=im,
                                              local_image=li, fps=fps),
                        (jnp.stack([y, y_neg]),))
                else:
                    y_out = model.apply(p, xc, tb, y=y, image=im,
                                        local_image=li, fps=fps)
                    u_out = model.apply(p, xc, tb, y=y_neg, image=im,
                                        local_image=li, fps=fps)
                return diffusion.classifier_free_guidance(y_out, u_out, 9.0)
            return diffusion.ddim_sample_scan(key, xx, steps, model_fn,
                                              ddim_timesteps=50)
        return jax.jit(run)

    for style in ("map", "explicit"):
        fn = seg(style)
        t0 = time.time()
        c = fn.lower(params, x).compile()
        comp = time.time() - t0
        np.asarray(c(params, x)[..., :1])  # host copy = real completion
        t0 = time.time()
        for _ in range(2):
            o = c(params, x)
            np.asarray(o[..., :1])
        dt = (time.time() - t0) / 2
        print(f"segment-5step cfg={style:8s}: {dt:7.2f} s "
              f"({5/dt:.3f} steps/s, compile {comp:.0f}s)", flush=True)


def main():
    model, params, args = build()
    x, t, y, im, li, fps = args
    if os.environ.get("BISECT_LADDER", "1") != "1":
        blocks.FUSED_TT = blocks.FUSED_TCONV = "auto"
        blocks.GN_IMPL = "named"
        segment_phase(model, params, args)
        return
    results = {}
    for name, tt, tconv, gn in LADDER:
        blocks.FUSED_TT = tt
        blocks.FUSED_TCONV = tconv
        blocks.GN_IMPL = gn
        fwd = jax.jit(lambda p, xx, tt_, yy, ii, ll, ff: model.apply(
            p, xx, tt_, y=yy, image=ii, local_image=ll, fps=ff))
        t0 = time.time()
        c = fwd.lower(params, x, t, y, im, li, fps).compile()
        comp = time.time() - t0
        fl = c.cost_analysis()
        fl = (fl[0] if isinstance(fl, (list, tuple)) else fl).get("flops", 0)
        # np.asarray, not block_until_ready: the axon tunnel's
        # block_until_ready returns before the device call completes
        # (same quirk bench.py works around) — only a host copy proves
        # completion
        np.asarray(c(params, x, t, y, im, li, fps)[..., :1])
        t0 = time.time()
        n = 3
        for _ in range(n):
            o = c(params, x, t, y, im, li, fps)
            np.asarray(o[..., :1])
        dt = (time.time() - t0) / n
        results[name] = dt
        print(f"{name:12s} tt={tt:4s} tconv={tconv:4s} gn={gn:5s}: "
              f"{dt*1e3:7.1f} ms/fwd  ({fl/dt/1e12:5.1f} TF/s, "
              f"compile {comp:.0f}s)", flush=True)
    base = results["r3_xla"]
    for name, dt in results.items():
        print(f"  {name:12s}: {dt/base:5.2f}x vs r3_xla", flush=True)
    if os.environ.get("BISECT_SEGMENT", "1") == "1":
        blocks.FUSED_TT = blocks.FUSED_TCONV = "auto"
        blocks.GN_IMPL = "named"
        segment_phase(model, params, args)


if __name__ == "__main__":
    main()
