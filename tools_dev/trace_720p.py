"""Trace one i2vgen 720p UNet forward (the bench stage-1 shape) and
print top ops by self-time — attribution for the 720p-vs-base MFU gap
(0.39-0.43 vs 0.46, BENCH r03/r04). Mirrors bench._build_i2vgen so the
compile cache hits.

Run: python tools_dev/trace_720p.py [outdir]
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_720p"
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "workspace", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench

    dtype = jnp.bfloat16
    f, lh, lw = 16, 88, 160
    cfg, model, autoencoder, diffusion, params = bench._build_i2vgen(dtype)

    y_words = jnp.zeros((1, 77, 1024), jnp.float32)
    y_vis = jnp.zeros((1, 1024), jnp.float32)
    fps = jnp.asarray([16], jnp.int32)
    local_image = jnp.zeros((1, f, lh, lw, 4), jnp.float32)
    x1 = jnp.zeros((1, f, lh, lw, 4), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)

    fwd = jax.jit(lambda p, x, t: model.apply(
        p, x, t, y=y_words, image=y_vis, local_image=local_image, fps=fps))
    t0 = time.time()
    compiled = fwd.lower(params, x1, t1).compile()
    print(f"compile {time.time() - t0:.0f}s", flush=True)
    o = compiled(params, x1, t1)
    _ = float(np.asarray(o.astype(jnp.float32).mean()))
    t0 = time.time()
    for _ in range(5):
        o = compiled(params, x1, t1)
    _ = float(np.asarray(o.astype(jnp.float32).mean()))
    per = (time.time() - t0) / 5 * 1e3
    print(f"720p fwd: {per:.1f} ms", flush=True)

    with jax.profiler.trace(outdir):
        for _ in range(3):
            o = compiled(params, x1, t1)
        _ = float(np.asarray(o.astype(jnp.float32).mean()))
    print("trace captured", flush=True)

    files = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print("no xplane files")
        return
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from trace_step import summarize
    summarize(max(files, key=os.path.getmtime))


if __name__ == "__main__":
    main()
