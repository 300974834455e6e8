"""Capture a jax.profiler trace of one base-res UNet forward (the real
bench shape: batched CFG, 2x16 frames @ 32x56 latent) and print the
top ops by self-time from the xplane proto. This is the ground-truth
attribution the per-block microbenchmarks approximate.

Run: python tools_dev/trace_step.py [outdir]
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import vgen_tpu  # noqa: F401
from vgen_tpu.core import MODEL, default_cfg


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    cfg = default_cfg()
    ucfg = dict(cfg.UNet, type="UNetSD_T2VBase", out_dim=4)
    model = MODEL.build(ucfg, dtype=jnp.bfloat16)
    lat_h, lat_w = 32, 56
    x0 = jnp.zeros((1, 2, lat_h, lat_w, 4))
    t0 = jnp.zeros((1,), jnp.int32)
    y0 = jnp.zeros((1, 77, 1024))
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x0, t0,
                                        y=y0))()
    x = jnp.zeros((2, 16, lat_h, lat_w, 4), jnp.bfloat16)
    y = jnp.zeros((2, 77, 1024), jnp.bfloat16)
    tt = jnp.asarray([500, 500])
    fwd = jax.jit(lambda p, x: model.apply(p, x, tt, y=y))
    o = fwd(params, x)
    _ = float(np.asarray(o.astype(jnp.float32).mean()))
    t1 = time.time()
    for _ in range(5):
        o = fwd(params, x)
    _ = float(np.asarray(o.astype(jnp.float32).mean()))
    print(f"fwd: {(time.time() - t1) / 5 * 1e3:.1f} ms", flush=True)

    with jax.profiler.trace(outdir):
        for _ in range(3):
            o = fwd(params, x)
        _ = float(np.asarray(o.astype(jnp.float32).mean()))
    print("trace captured", flush=True)

    files = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplane files:", files, flush=True)
    if not files:
        return
    summarize(max(files, key=os.path.getmtime))


def summarize(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        print(f"== plane: {plane.name}")
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = {}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e9
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
            print(f"  {ms:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
