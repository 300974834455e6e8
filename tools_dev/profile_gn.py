"""Fused pallas GroupNorm vs flax nn.GroupNorm vs jnp reference."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
from flax import linen as nn

import vgen_tpu  # noqa: F401
from vgen_tpu.ops.groupnorm import _gn_ref, group_norm


def bench(name, fn, *args, n=50):
    @jax.jit
    def many(x0, *rest):
        def step(x, _):
            return fn(x, *rest).astype(x0.dtype), ()
        out, _ = jax.lax.scan(step, x0, None, length=n)
        return out

    o = jax.block_until_ready(many(*args))
    _ = float(o.astype(jnp.float32).mean())
    t0 = time.time()
    o = many(*args)
    _ = float(o.astype(jnp.float32).mean())
    print(f"{name:44s}: {(time.time() - t0) / n * 1e3:6.3f} ms")


def case(shape, label):
    x = jnp.ones(shape, jnp.bfloat16)
    c = shape[-1]
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)

    m = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.bfloat16)
    p = m.init(jax.random.PRNGKey(0), x)
    bench(f"flax GN      {label}", lambda xx: m.apply(p, xx), x)
    bench(f"jnp ref GN   {label}",
          lambda xx: _gn_ref(xx.reshape(shape[0], -1, c), scale, bias, 32,
                             1e-5, None).reshape(shape), x)
    bench(f"fused GN     {label}",
          lambda xx: group_norm(xx, scale, bias), x)
    bench(f"fused GN+silu{label}",
          lambda xx: group_norm(xx, scale, bias, act="silu"), x)

    # numerics
    xr = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32) \
        .astype(jnp.bfloat16)
    a = m.apply(p, xr).astype(jnp.float32)
    b = group_norm(xr, scale, bias).astype(jnp.float32)
    print(f"  max|flax - fused| = {float(jnp.abs(a - b).max()):.2e}")


case((32, 32, 56, 320), "[32,32,56,320] (ResBlock c320)")
case((32, 8, 14, 1280), "[32,8,14,1280] (ResBlock c1280)")
case((2, 16, 32, 56, 320), "[2,16,32,56,320] (temporal GN)")
