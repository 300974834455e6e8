"""Fused TemporalConvBlock chain vs the flax/XLA path, on-chip timing.

Times both paths at the model zoo's dispatchable shapes with a scanned
device-side loop (tunnel per-call overhead is large — see the verify
skill notes). Also times the 720p-critical shapes separately so the
dispatch gate can be tightened per-width if one loses.

Run: python tools_dev/profile_fused_tconv.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import vgen_tpu  # noqa: F401
from vgen_tpu.models import blocks
from vgen_tpu.ops import fused_tconv
from tests.test_fused_tconv import _make_block

# the module path auto-fuses ON TPU — keep the flax timing honest
blocks.FUSED_TCONV = "off"

SHAPES = [
    (2, 16, 32, 56, 320),   # base t2v level 1
    (2, 16, 16, 28, 640),   # base t2v level 2
    (1, 16, 88, 160, 320),  # i2vgen 720p level 1
    (1, 16, 44, 80, 640),   # i2vgen 720p level 2
]


def timeit(fn, x, n):
    @jax.jit
    def many(xx):
        def step(h, _):
            return (xx + fn(h) * 1e-6).astype(h.dtype), ()
        out, _ = jax.lax.scan(step, xx, None, length=n)
        return out

    o = many(x)
    _ = float(np.asarray(o.astype(jnp.float32).mean()))
    t0 = time.time()
    o = many(x)
    _ = float(np.asarray(o.astype(jnp.float32).mean()))
    return (time.time() - t0) / n


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    for shape in SHAPES:
        b, f, h, w, c = shape
        n = 50 if h < 64 else 20
        tc, params, x = _make_block(jax.random.PRNGKey(0), shape)
        t_flax = timeit(lambda h_: tc.apply(params, h_), x, n)
        t_fused = timeit(
            lambda h_: fused_tconv.fused_temporal_conv_chain(
                h_, params["params"]), x, n)
        # traffic floor: ~10 passes fused vs ~13 flax of b*f*hw*c bf16
        gb = x.size * 2 / 1e9
        print(f"{shape}: flax {t_flax*1e3:7.3f} ms ({13*gb/t_flax:5.0f} GB/s"
              f" @13p)  fused {t_fused*1e3:7.3f} ms "
              f"({10*gb/t_fused:5.0f} GB/s @10p)  "
              f"speedup {t_flax/t_fused:.2f}x", flush=True)


if __name__ == "__main__":
    main()
