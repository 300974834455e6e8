"""Ablate SpatialTransformer c320 @32x56 to locate the perf gap.

Pieces: full block, attention-only (flash vs dense), linears-only,
GroupNorm-only. Run on the TPU: python tools_dev/profile_spat.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

import vgen_tpu  # noqa: F401
from vgen_tpu.models.blocks import GroupNorm32, SpatialTransformer
import importlib
attn_mod = importlib.import_module('vgen_tpu.ops.attention')

BF, H, W, C = 32, 32, 56, 320
S = H * W
HEADS, DH = C // 64, 64


def bench(name, fn, *args, n=30):
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
    dt = (time.time() - t0) / n
    print(f"{name:40s}: {dt * 1e3:6.2f} ms")


def main():
    x_img = jnp.zeros((BF, H, W, C), jnp.bfloat16)
    ctx = jnp.zeros((BF, 77, 1024), jnp.bfloat16)
    q = jnp.zeros((BF, S, HEADS, DH), jnp.bfloat16)

    m = SpatialTransformer(heads=HEADS, dim_head=DH, dtype=jnp.bfloat16)
    p = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x_img, ctx))()
    bench("SpatialTransformer full", lambda x: m.apply(p, x, ctx), x_img)

    bench("flash attention self (S=1792)",
          lambda qq: attn_mod.attention(qq, qq, qq), q)
    def dense(qq):
        bh = qq.transpose(0, 2, 1, 3).reshape(BF * HEADS, S, DH)
        o, _ = attn_mod._dense_fwd(bh, bh, bh, 1.0 / DH ** 0.5)
        return o.reshape(BF, HEADS, S, DH).transpose(0, 2, 1, 3)
    bench("dense attention self (S=1792)", dense, q)

    gn = GroupNorm32(dtype=jnp.bfloat16)
    pg = gn.init(jax.random.PRNGKey(0), x_img)
    bench("GroupNorm32 @32x56xc320", lambda x: gn.apply(pg, x), x_img)

    # linears: emulate qkvo + ff flops without attention
    wq = jnp.zeros((C, C), jnp.bfloat16)
    wff1 = jnp.zeros((C, 2 * 4 * C), jnp.bfloat16)
    wff2 = jnp.zeros((4 * C, C), jnp.bfloat16)

    def linears(x):
        t = x.reshape(BF, S, C)
        for _ in range(6):  # qkv,o self + q,o cross (proj_in/out ~2 more)
            t = t @ wq
        u = t @ wff1
        a, b = jnp.split(u, 2, axis=-1)
        t = (a * jax.nn.gelu(b)) @ wff2
        return t.reshape(BF, H, W, C)

    bench("linears only (6x320^2 + GEGLU ff)", linears, x_img)


if __name__ == "__main__":
    main()
