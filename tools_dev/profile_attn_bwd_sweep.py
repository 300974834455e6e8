"""Block-size sweep for the Pallas flash-attention backward at the
UNet train hot shape (BH=320, S=1792, D=64, bf16)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from vgen_tpu.ops.attention import _dense_fwd, _flash_bwd_tpu, _flash_fwd_tpu

N = 20
BH, S, D = 320, 1792, 64


def timeit(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    np.asarray(c(*args))
    t0 = time.time()
    np.asarray(c(*args))
    return (time.time() - t0) / N


def scanned(body, *args):
    def run(*a):
        def step(c, _):
            out = body(a[0] + c, *a[1:])
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in out)
            return (s * 1e-30).astype(a[0].dtype), None
        acc, _ = jax.lax.scan(step, jnp.zeros((), a[0].dtype), None, length=N)
        return acc
    return run


if __name__ == "__main__":
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(BH, S, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(BH, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(BH, S, D), jnp.bfloat16)
    do = jnp.asarray(rng.randn(BH, S, D), jnp.bfloat16)
    scale = D ** -0.5
    o, lse = jax.jit(lambda q, k, v: _flash_fwd_tpu(q, k, v, scale))(q, k, v)
    flops = 10 * BH * S * S * D

    for bq, bk in [(256, 512), (256, 1024), (512, 512), (512, 1024),
                   (128, 2048), (256, 2048), (512, 2048), (1024, 1024)]:
        try:
            t = timeit(scanned(
                lambda q, k, v, do, bq=bq, bk=bk: _flash_bwd_tpu(
                    q, k, v, o, lse, do, scale, bq=bq, bk=bk)),
                q, k, v, do)
            print(f"bq={bq:5d} bk={bk:5d}: {t*1e3:7.3f} ms "
                  f"{flops/t/1e12:6.1f} TFLOP/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq:5d} bk={bk:5d}: FAILED {type(e).__name__}",
                  flush=True)
