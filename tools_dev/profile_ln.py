"""LayerNorm is the slowest per-byte op in the UNet forward: standalone
nn.LayerNorm on [3584,16,320] measured 7.38 ms (~10 GB/s effective,
profile_tt_parts.py) because the stats reduce over the MINOR (lane) dim
C=320 — a cross-lane VPU reduction — while GroupNorm (sublane reduce,
same bytes) takes 0.69 ms. Sweep pure-HLO reformulations; the winner
must stay native HLO (no Pallas) so it can't perturb XLA's globally
coupled layout assignment (see ops/groupnorm.py negative result).

Candidates:
  * dot-stats: sum / sum-of-squares via dot_general against a ones
    vector with f32 accumulation — streams x through the MXU at HBM
    bandwidth instead of lane-shuffling on the VPU.
  * combined dot: [x ; x*x] @ ones in one dot (extra bf16 square pass).
  * bf16 stats (flax keep_dtype) for comparison.

Run: python tools_dev/profile_ln.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def bench(name, fn, *args, n=200, bytes_rw=0.0):
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
    print(f"{name:44s}: {dt * 1e3:6.3f} ms{bw}", flush=True)
    return dt


def ln_dot_stats(h, eps=1e-6):
    c = h.shape[-1]
    ones = jnp.ones((c,), h.dtype)
    # f32-accumulated MXU reductions over the minor dim
    s1 = jax.lax.dot_general(h, ones, (((h.ndim - 1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s2 = jax.lax.dot_general(h * h, ones, (((h.ndim - 1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    m = (s1 / c)[..., None]
    v = (s2 / c)[..., None] - m * m
    return ((h.astype(jnp.float32) - m)
            * jax.lax.rsqrt(v + eps)).astype(h.dtype)


def ln_jnp(h, eps=1e-6):
    hf = h.astype(jnp.float32)
    m = hf.mean(-1, keepdims=True)
    v = jnp.mean(jnp.square(hf), -1, keepdims=True) - m * m
    return ((hf - m) * jax.lax.rsqrt(v + eps)).astype(h.dtype)


def main():
    key = jax.random.PRNGKey(0)
    for shape in [(3584, 16, 320), (57344, 320), (32, 1792, 320),
                  (57344, 640), (14336, 1280)]:
        x = jax.random.normal(key, shape).astype(jnp.bfloat16)
        rw = x.nbytes * 2
        ln = nn.LayerNorm(dtype=jnp.bfloat16)
        p = jax.jit(lambda l=ln, h=x: l.init(jax.random.PRNGKey(1), h))()
        bench(f"nn.LayerNorm {shape}", lambda h, pp, l=ln: l.apply(pp, h),
              x, p, bytes_rw=rw)
        bench(f"ln jnp f32-stats {shape}", ln_jnp, x, bytes_rw=rw)
        bench(f"ln dot-stats {shape}", ln_dot_stats, x, bytes_rw=rw)
        # numeric check
        a = np.asarray(ln_dot_stats(x), np.float32)
        b = np.asarray(ln_jnp(x), np.float32)
        print(f"   max|dot-jnp| = {np.abs(a - b).max():.4f}", flush=True)


if __name__ == "__main__":
    main()
