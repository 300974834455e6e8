"""Dissect TemporalTransformer time at c320 (measured 6.5 ms,
profile_blocks.py, ~38 TF/s): norms vs qkv/out projections vs the tiny
dense attention vs FF. Tokens = frames (16), rows = B*h*w = 3584.

Run: python tools_dev/profile_tt_parts.py
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
from vgen_tpu.models.blocks import TemporalTransformer
from vgen_tpu.ops.attention import attention

B, F, H, W, C = 2, 16, 32, 56, 320
HEADS, DH = 5, 64
ROWS = B * H * W  # 3584


def bench(name, fn, *args, n=50, flops=0.0):
    @jax.jit
    def many(*a):
        def step(x, _):
            o = fn(x, *a[1:])
            # fold a scalar of o into the carry (shape-agnostic, keeps the
            # loop body live under XLA's loop-invariant hoisting)
            return (a[0] + o.astype(jnp.float32).mean() * 1e-6).astype(
                x.dtype), ()
        out, _ = jax.lax.scan(step, a[0], None, length=n)
        return out

    # scalar-reduce on device before fetching (tunnel transfer ≈16 ms/iter
    # of fake time otherwise — see profile_resblock_parts.py)
    o = many(*args)
    _ = float(np.asarray(o.astype(jnp.float32).mean()))
    t0 = time.time()
    o = many(*args)
    _ = float(np.asarray(o.astype(jnp.float32).mean()))
    dt = (time.time() - t0) / n
    eff = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:34s}: {dt * 1e3:6.2f} ms{eff}", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    xv = jax.random.normal(key, (B, F, H, W, C)).astype(jnp.bfloat16)

    tt = TemporalTransformer(heads=HEADS, dim_head=DH, dtype=jnp.bfloat16)
    ptt = jax.jit(lambda: tt.init(jax.random.PRNGKey(1), xv))()
    bench("TemporalTransformer full", lambda h, p: tt.apply(p, h), xv, ptt,
          flops=0.25e12)

    # token-major view used inside: [ROWS, F, C]
    xt = jax.random.normal(key, (ROWS, F, C)).astype(jnp.bfloat16)

    # qkv projection (3 fused) + out projection
    dq = nn.Dense(3 * C, dtype=jnp.bfloat16)
    pdq = jax.jit(lambda: dq.init(jax.random.PRNGKey(2), xt))()
    fl = 2 * ROWS * F * C * 3 * C
    bench("qkv Dense 320->960", lambda h, p: dq.apply(p, h), xt, pdq,
          flops=fl)

    # tiny dense attention on [ROWS*HEADS, F, DH]
    q = jax.random.normal(key, (ROWS, F, HEADS, DH)).astype(jnp.bfloat16)
    fla = 4 * ROWS * HEADS * F * F * DH
    bench("attention S=16 (dispatch)", lambda a: attention(a, a, a), q,
          flops=fla)

    # GEGLU FF (C -> 4C gate -> C)
    class FF(nn.Module):
        @nn.compact
        def __call__(self, h):
            a = nn.Dense(8 * C, dtype=jnp.bfloat16)(h)
            a, g = jnp.split(a, 2, axis=-1)
            return nn.Dense(C, dtype=jnp.bfloat16)(a * nn.gelu(g))
    ff = FF()
    pff = jax.jit(lambda: ff.init(jax.random.PRNGKey(3), xt))()
    flf = 2 * ROWS * F * C * 8 * C + 2 * ROWS * F * 4 * C * C
    bench("GEGLU FF x4", lambda h, p: ff.apply(p, h), xt, pff, flops=flf)

    # LayerNorm over [ROWS, F, C]
    ln = nn.LayerNorm(dtype=jnp.bfloat16)
    pln = jax.jit(lambda: ln.init(jax.random.PRNGKey(4), xt))()
    bench("LayerNorm", lambda h, p: ln.apply(p, h), xt, pln)


if __name__ == "__main__":
    main()
