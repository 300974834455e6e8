"""Minimal instrumented probe of ONE i2vgen 720p forward.

Prints wall-clock for every phase (build/init/cast/compile/dispatch/
materialize) to separate device-compute time from tunnel/dispatch
overhead — the r5 bench shows 4.45 s/fwd where r3 measured ~1.04 s/fwd,
and the first bisect attempt suggested even eager phases are slow.

Env: PROBE_TT / PROBE_TCONV / PROBE_GN override the blocks flags
(default: current r5 defaults). PROBE_N forwards (default 3).

Run: python tools_dev/probe_720p_fwd.py
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

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    blocks.FUSED_TT = os.environ.get("PROBE_TT", blocks.FUSED_TT)
    blocks.FUSED_TCONV = os.environ.get("PROBE_TCONV", blocks.FUSED_TCONV)
    blocks.GN_IMPL = os.environ.get("PROBE_GN", blocks.GN_IMPL)
    mark(f"flags tt={blocks.FUSED_TT} tconv={blocks.FUSED_TCONV} "
         f"gn={blocks.GN_IMPL}; device={jax.devices()[0]}")

    import yaml

    from vgen_tpu.core import MODEL, default_cfg
    cfg = default_cfg()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "configs/i2vgen_xl_train.yaml")) as f:
        train = yaml.safe_load(f)
    cfg.UNet = dict(train["UNet"])
    model = MODEL.build(dict(cfg.UNet), dtype=jnp.bfloat16)
    f_, lh, lw = 16, 88, 160
    x0 = jnp.zeros((1, 2, lh, lw, 4))
    t0 = jnp.zeros((1,), jnp.int32)
    y0 = jnp.zeros((1, 77, 1024))
    ikw = dict(image=jnp.zeros((1, 1024)),
               local_image=jnp.zeros((1, 1, lh, lw, 4)),
               fps=jnp.asarray([16], jnp.int32))
    mark("building params (jit init+cast, one program)")

    def _init_bf16():
        p = model.init(jax.random.PRNGKey(0), x0, t0, y=y0, **ikw)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)

    params = jax.jit(_init_bf16)()
    jax.block_until_ready(params)
    mark("params ready")

    x = jax.random.normal(jax.random.PRNGKey(1), (1, f_, lh, lw, 4))
    t = jnp.full((1,), 500, jnp.int32)
    y = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 1024)) * 0.02
    li = jnp.zeros((1, f_, lh, lw, 4), jnp.float32)
    im = jnp.zeros((1, 1024), jnp.float32)
    fps = jnp.asarray([16], jnp.int32)

    fwd = jax.jit(lambda p, xx, tt_, yy, ii, ll, ff: model.apply(
        p, xx, tt_, y=yy, image=ii, local_image=ll, fps=ff))
    c = fwd.lower(params, x, t, y, im, li, fps).compile()
    fl = c.cost_analysis()
    fl = (fl[0] if isinstance(fl, (list, tuple)) else fl).get("flops", 0)
    mark(f"compiled ({fl/1e12:.1f} TFLOP)")

    o = c(params, x, t, y, im, li, fps)
    mark("dispatch returned")
    jax.block_until_ready(o)
    mark("block_until_ready returned")
    np.asarray(o[..., :1])
    mark("np.asarray(o[...:1]) returned  <- warmup complete")

    n = int(os.environ.get("PROBE_N", 3))
    for i in range(n):
        td = time.time()
        o = c(params, x, t, y, im, li, fps)
        t_disp = time.time() - td
        np.asarray(o[..., :1])
        t_all = time.time() - td
        mark(f"iter {i}: dispatch {t_disp*1e3:.0f} ms, "
             f"total {t_all:7.3f} s ({fl/t_all/1e12:5.1f} TF/s)")


if __name__ == "__main__":
    main()
