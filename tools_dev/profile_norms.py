"""Why are norms slow? LayerNorm on [3584, 16, 320] measured 7.38 ms
(profile_tt_parts.py) = ~10 GB/s effective vs 819 GB/s HBM — and
GroupNorm32 on [32, 32, 56, 320] is 0.69 ms (~106 GB/s). Sweep layouts,
dtypes and hand-rolled formulations to find the fast shape.

Run: python tools_dev/profile_norms.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import vgen_tpu  # noqa: F401
from vgen_tpu.models.blocks import GroupNorm32

ROWS, F, C = 3584, 16, 320


def bench(name, fn, *args, n=50, bytes_rw=0.0):
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
    bw = f"  {bytes_rw / dt / 1e9:6.0f} GB/s" if bytes_rw else ""
    print(f"{name:40s}: {dt * 1e3:6.2f} ms{bw}", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    nbytes = ROWS * F * C * 2  # bf16
    rw = nbytes * 2

    x3 = jax.random.normal(key, (ROWS, F, C)).astype(jnp.bfloat16)
    x2 = x3.reshape(ROWS * F, C)

    ln = nn.LayerNorm(dtype=jnp.bfloat16)
    p3 = jax.jit(lambda: ln.init(jax.random.PRNGKey(1), x3))()
    bench("nn.LayerNorm [3584,16,320]", lambda h, p: ln.apply(p, h), x3, p3,
          bytes_rw=rw)
    bench("nn.LayerNorm [57344,320]", lambda h, p: ln.apply(p, h), x2, p3,
          bytes_rw=rw)

    # hand-rolled f32-stats LN, no affine
    def ln_hand(h):
        hf = h.astype(jnp.float32)
        m = hf.mean(-1, keepdims=True)
        v = jnp.mean(jnp.square(hf - m), -1, keepdims=True)
        return ((hf - m) * jax.lax.rsqrt(v + 1e-5)).astype(h.dtype)
    bench("hand LN f32 stats [3584,16,320]", ln_hand, x3, bytes_rw=rw)
    bench("hand LN f32 stats [57344,320]", ln_hand, x2, bytes_rw=rw)

    # bf16-stats variant
    def ln_bf(h):
        m = h.mean(-1, keepdims=True)
        v = jnp.mean(jnp.square(h - m), -1, keepdims=True)
        return (h - m) * jax.lax.rsqrt(v + 1e-5)
    bench("hand LN bf16 stats [57344,320]", ln_bf, x2, bytes_rw=rw)

    # pure elementwise / pure reduction baselines
    bench("x*2+1 elementwise [57344,320]", lambda h: h * 2 + 1, x2,
          bytes_rw=rw)
    bench("mean(-1) only [57344,320]", lambda h: h * h.mean(-1, keepdims=True),
          x2, bytes_rw=rw)

    # GroupNorm32 layouts
    xg = jax.random.normal(key, (32, 32, 56, C)).astype(jnp.bfloat16)
    gn = GroupNorm32(dtype=jnp.bfloat16)
    pg = jax.jit(lambda: gn.init(jax.random.PRNGKey(2), xg))()
    bench("GroupNorm32 [32,32,56,320]", lambda h, p: gn.apply(p, h), xg, pg,
          bytes_rw=rw)

    # hand GN: reshape to groups, f32 stats
    def gn_hand(h):
        b = h.shape[0]
        hf = h.astype(jnp.float32).reshape(b, -1, 32, C // 32)
        m = hf.mean((1, 3), keepdims=True)
        v = jnp.mean(jnp.square(hf - m), (1, 3), keepdims=True)
        return ((hf - m) * jax.lax.rsqrt(v + 1e-5)).reshape(h.shape).astype(
            h.dtype)
    bench("hand GN f32 stats", gn_hand, xg, bytes_rw=rw)

    # welford-free two-pass with sums (single fused reduce of x and x^2)
    def gn_sums(h):
        b = h.shape[0]
        hf = h.astype(jnp.float32).reshape(b, -1, 32, C // 32)
        s1 = hf.sum((1, 3), keepdims=True)
        s2 = jnp.square(hf).sum((1, 3), keepdims=True)
        cnt = hf.shape[1] * hf.shape[3]
        m = s1 / cnt
        v = s2 / cnt - jnp.square(m)
        return ((hf - m) * jax.lax.rsqrt(v + 1e-5)).reshape(h.shape).astype(
            h.dtype)
    bench("hand GN sum/sumsq", gn_sums, xg, bytes_rw=rw)


if __name__ == "__main__":
    main()
