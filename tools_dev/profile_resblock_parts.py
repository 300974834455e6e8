"""Dissect ResBlock time at the c320 hot shape: which of the ~4.5 ms
(measured, profile_blocks.py) is conv MXU time vs GN/elementwise vs the
temporal (3,1,1) chain — and do alternative formulations beat XLA's.

Roofline at [32,32,56,320] bf16: spatial convs 0.21 TF + temporal chain
0.14 TF = 0.35 TF -> 2.1 ms at 167 TF/s; ~12 elementwise passes of
36.7 MB -> ~0.55 ms at 800 GB/s. Floor ~2.7 ms vs 4.5 measured.

Run: python tools_dev/profile_resblock_parts.py
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
from vgen_tpu.models.blocks import (GroupNorm32, ResBlock,
                                    TemporalConvBlock)

BF, H, W, C = 32, 32, 56, 320
B, F = 2, 16


def bench(name, fn, *args, n=50, flops=0.0):
    @jax.jit
    def many(*a):
        def step(x, _):
            o = fn(x, *a[1:])
            return (a[0] + o * 1e-6).astype(x.dtype), ()
        out, _ = jax.lax.scan(step, a[0], None, length=n)
        return out

    # reduce to a scalar ON DEVICE before fetching — device_get of the
    # full array ships ~37 MB through the axon tunnel (~16 ms/iter of
    # fake time when amortized over n)
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
    x = jax.random.normal(key, (BF, H, W, C)).astype(jnp.bfloat16)
    emb = jax.random.normal(key, (BF, 1280)).astype(jnp.bfloat16)

    # full block
    rb = ResBlock(dtype=jnp.bfloat16)
    prb = jax.jit(lambda: rb.init(jax.random.PRNGKey(1), x, emb, F))()
    bench("ResBlock full", lambda h, p, e: rb.apply(p, h, e, F), x, prb, emb,
          flops=0.35e12)

    # spatial 3x3 conv alone
    cv = nn.Conv(C, (3, 3), padding=1, dtype=jnp.bfloat16)
    pcv = jax.jit(lambda: cv.init(jax.random.PRNGKey(2), x))()
    fl = 2 * 9 * C * C * BF * H * W
    bench("conv3x3 c320", lambda h, p: cv.apply(p, h), x, pcv, flops=fl)

    # conv3x3 as 9-tap matmul (im2col-free: 9 shifted matmuls summed)
    w9 = jax.random.normal(key, (9, C, C)).astype(jnp.bfloat16) * 0.02

    def conv_mm(h, w):
        out = jnp.zeros_like(h)
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        i = 0
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                out = out + hp[:, dy:dy + H, dx:dx + W] @ w[i]
                i += 1
        return out
    bench("conv3x3 as 9 shifted matmuls", conv_mm, x, w9, flops=fl)

    # GroupNorm alone / + silu
    gn = GroupNorm32(dtype=jnp.bfloat16)
    pgn = jax.jit(lambda: gn.init(jax.random.PRNGKey(3), x))()
    bench("GroupNorm32", lambda h, p: gn.apply(p, h), x, pgn)
    bench("GroupNorm32+silu", lambda h, p: nn.silu(gn.apply(p, h)), x, pgn)

    # temporal chain alone
    tc = TemporalConvBlock(dtype=jnp.bfloat16)
    xv = x.reshape(B, F, H, W, C)
    ptc = jax.jit(lambda: tc.init(jax.random.PRNGKey(4), xv))()
    bench("TemporalConvBlock (4x)", lambda h, p: tc.apply(p, h), xv, ptc,
          flops=0.14e12)

    # single (3,1,1) conv 3D vs matmul-over-shifts formulation
    c3 = nn.Conv(C, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                 dtype=jnp.bfloat16)
    pc3 = jax.jit(lambda: c3.init(jax.random.PRNGKey(5), xv))()
    fl3 = 2 * 3 * C * C * BF * H * W
    bench("conv(3,1,1) 3D", lambda h, p: c3.apply(p, h), xv, pc3, flops=fl3)

    wt = jax.random.normal(key, (3, C, C)).astype(jnp.bfloat16) * 0.02

    def tconv_mm(h, w):
        prev = jnp.concatenate([jnp.zeros_like(h[:, :1]), h[:, :-1]], 1)
        nxt = jnp.concatenate([h[:, 1:], jnp.zeros_like(h[:, :1])], 1)
        return prev @ w[0] + h @ w[1] + nxt @ w[2]
    bench("conv(3,1,1) as 3 matmuls", tconv_mm, xv, wt, flops=fl3)

    def tconv_mm1(h, w):
        # one [3C, C] matmul on concat(prev, x, next)
        prev = jnp.concatenate([jnp.zeros_like(h[:, :1]), h[:, :-1]], 1)
        nxt = jnp.concatenate([h[:, 1:], jnp.zeros_like(h[:, :1])], 1)
        cat = jnp.concatenate([prev, h, nxt], axis=-1)
        return cat @ w.reshape(3 * C, C)
    bench("conv(3,1,1) as concat matmul", tconv_mm1, xv, wt, flops=fl3)


if __name__ == "__main__":
    main()
