"""TemporalTransformer sub-op ablation: where do 4.75 GB/block go?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
from flax import linen as nn

import vgen_tpu  # noqa: F401
from vgen_tpu.models.blocks import TemporalTransformer
from vgen_tpu.ops.attention import attention

B, F, H, W, C = 2, 16, 32, 56, 320
HEADS, DH = 5, 64
N = 100


def bench(name, fn, *args):
    jfn = jax.jit(lambda x0, *rest: jax.lax.scan(
        lambda x, _: (fn(x, *rest).astype(x0.dtype), ()), x0, None,
        length=N)[0])
    o = jax.block_until_ready(jfn(*args))
    _ = float(o.astype(jnp.float32).mean())
    try:
        ca = jfn.lower(*args).compile().cost_analysis()
        gb = ca.get("bytes accessed", 0.0) / N / 1e9
    except Exception:  # noqa: BLE001
        gb = float("nan")
    t0 = time.time()
    o = jfn(*args)
    _ = float(o.astype(jnp.float32).mean())
    print(f"{name:40s}: {(time.time() - t0) / N * 1e3:6.3f} ms  {gb:6.2f} GB")


x5 = jnp.ones((B, F, H, W, C), jnp.bfloat16)

m = TemporalTransformer(heads=HEADS, dim_head=DH, dtype=jnp.bfloat16)
p = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x5))()
bench("TemporalTransformer full", lambda x: m.apply(p, x), x5)

wq = jnp.zeros((C, C), jnp.bfloat16)
wff1 = jnp.zeros((C, 8 * C), jnp.bfloat16)
wff2 = jnp.zeros((4 * C, C), jnp.bfloat16)
ln_s = jnp.ones((C,), jnp.float32)


def ln(t):
    mu = t.mean(-1, keepdims=True)
    var = ((t - mu) ** 2).mean(-1, keepdims=True)
    return ((t - mu) * jax.lax.rsqrt(var + 1e-5)).astype(t.dtype)


def attn_self(t):
    bb, s, c = t.shape
    q = (t @ wq).reshape(bb, s, HEADS, DH)
    o = attention(q, q, q).reshape(bb, s, c)
    return o @ wq


def piece(kind):
    def run(x):
        t = x.transpose(0, 2, 3, 1, 4).reshape(B * H * W, F, C)
        if kind == "transpose_only":
            pass
        elif kind == "proj":
            t = t @ wq
            t = t @ wq
        elif kind == "ln3":
            t = ln(ln(ln(t)))
        elif kind == "attn2":
            t = t + attn_self(ln(t))
            t = t + attn_self(ln(t))
        elif kind == "ff":
            h = ln(t) @ wff1
            a, b2 = jnp.split(h, 2, axis=-1)
            t = t + (a * nn.gelu(b2)) @ wff2
        elif kind == "all_manual":
            t = t @ wq
            t = t + attn_self(ln(t))
            t = t + attn_self(ln(t))
            h = ln(t) @ wff1
            a, b2 = jnp.split(h, 2, axis=-1)
            t = t + (a * nn.gelu(b2)) @ wff2
            t = t @ wq
        y = t.reshape(B, H, W, F, C).transpose(0, 3, 1, 2, 4)
        return x + y
    return run


for kind in ("transpose_only", "proj", "ln3", "attn2", "ff", "all_manual"):
    bench(f"manual: {kind}", piece(kind), x5)
