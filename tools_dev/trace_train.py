"""Capture a jax.profiler trace of the fused train step at the bench
shape (16f 448x256, adafactor, bf16, remat) and print top ops by
self-time — attribution for the fwd-vs-train MFU gap (0.46 vs 0.37,
BENCH_r04). Mirrors bench.bench_train exactly so the compile cache hits.

Run: python tools_dev/trace_train.py [outdir] [batch]
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

import vgen_tpu  # noqa: F401
from vgen_tpu.core import DIFFUSION, MODEL, default_cfg
from vgen_tpu.engines.train_t2v import make_train_step
from vgen_tpu.utils.optim import adafactor, annealing_lr


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_train"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "workspace", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = default_cfg()
    cfg.update({"max_frames": 16, "resolution": [448, 256],
                "p_zero": 0.1, "ema_decay": 0.9999, "use_div_loss": False})
    cfg.UNet = dict(cfg.UNet, type="UNetSD_T2VBase", out_dim=4,
                    use_checkpoint=True, dtype=jnp.bfloat16)
    model = MODEL.build(dict(cfg.UNet), training=True)
    diffusion = DIFFUSION.build(dict(cfg.Diffusion))

    f, lh, lw = 16, 32, 56
    key = jax.random.PRNGKey(0)
    x0s = jnp.zeros((1, 2, lh, lw, 4))
    params = jax.jit(lambda: model.init(
        {"params": key, "dropout": key}, x0s, jnp.zeros((1,), jnp.int32),
        y=jnp.zeros((1, 77, 1024))))()
    sched = annealing_lr(5e-5, 10, 1000, "cosine")
    optimizer = adafactor(sched)
    train_step = make_train_step(cfg, model, diffusion, optimizer,
                                 use_ema=False)
    state = {"params": params, "opt_state": optimizer.init(params),
             "step": jnp.zeros((), jnp.int32)}
    zero_y = jnp.zeros((1, 77, 1024))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, f, lh, lw, 4))
    y = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 1024)) * 0.02

    t0 = time.time()
    compiled = train_step.lower(state, x0, y, zero_y, key).compile()
    print(f"compile {time.time() - t0:.0f}s", flush=True)

    state, _ = compiled(state, x0, y, zero_y, key)
    jax.block_until_ready(state)
    t0 = time.time()
    for _ in range(3):
        state, m = compiled(state, x0, y, zero_y, key)
    jax.block_until_ready(state)
    print(f"train step b{b}: {(time.time() - t0) / 3 * 1e3:.0f} ms/it",
          flush=True)

    with jax.profiler.trace(outdir):
        for _ in range(2):
            state, m = compiled(state, x0, y, zero_y, key)
        jax.block_until_ready(state)
    print("trace captured", flush=True)

    files = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print("no xplane files")
        return
    from trace_step import summarize
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    summarize(max(files, key=os.path.getmtime))


if __name__ == "__main__":
    main()
