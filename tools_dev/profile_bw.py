"""Establish real achievable HBM bandwidth and the scan-harness tax.
profile_norms.py saw 125 GB/s even for x*2+1 — either every
bandwidth-bound op is ~6x off the 819 GB/s spec, or the harness's
per-step carry fold costs a pass. Chain the output directly as the
carry (no mean fold) and sweep shapes/sizes.

Run: python tools_dev/profile_bw.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, x, n=100, bytes_rw=0.0):
    @jax.jit
    def many(x0):
        def step(x, _):
            return fn(x).astype(x0.dtype), ()
        out, _ = jax.lax.scan(step, x0, None, length=n)
        return out

    o = many(x)
    _ = float(np.asarray(o.astype(jnp.float32).mean()))
    t0 = time.time()
    o = many(x)
    _ = float(np.asarray(o.astype(jnp.float32).mean()))
    dt = (time.time() - t0) / n
    bw = f"  {bytes_rw / dt / 1e9:6.0f} GB/s" if bytes_rw else ""
    print(f"{name:44s}: {dt * 1e3:6.3f} ms{bw}", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    for shape in [(57344, 320), (57344, 512), (57344, 128),
                  (448, 128, 320), (57344 * 8, 320), (4096, 4096)]:
        x = jax.random.normal(key, shape).astype(jnp.bfloat16)
        rw = x.nbytes * 2
        bench(f"x*2+1 bf16 {shape}", lambda h: h * 2 + 1, x, bytes_rw=rw)

    x = jax.random.normal(key, (57344, 320)).astype(jnp.bfloat16)
    rw = x.nbytes * 2
    # mean-fold variant (the profile_norms harness) to isolate its tax
    @jax.jit
    def many_fold(x0):
        def step(x, _):
            o = x * 2 + 1
            return (x0 + o.astype(jnp.float32).mean() * 1e-6).astype(
                x0.dtype), ()
        out, _ = jax.lax.scan(step, x0, None, length=100)
        return out
    o = many_fold(x)
    _ = float(np.asarray(o.astype(jnp.float32).mean()))
    t0 = time.time()
    o = many_fold(x)
    _ = float(np.asarray(o.astype(jnp.float32).mean()))
    dt = (time.time() - t0) / 100
    print(f"{'x*2+1 + mean-fold carry (57344,320)':44s}: {dt*1e3:6.3f} ms"
          f"  {rw / dt / 1e9:6.0f} GB/s", flush=True)

    # f32 for comparison
    xf = jax.random.normal(key, (57344, 320))
    bench("x*2+1 f32 (57344,320)", lambda h: h * 2 + 1, xf,
          bytes_rw=xf.nbytes * 2)


if __name__ == "__main__":
    main()
