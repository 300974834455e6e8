"""Layout-flip study: does re-expressing the UNet's 3x3/(3,1,1) convs as
shifted matmuls (blocks.CONV_IMPL="matmul") flip XLA's global layout
assignment to matmul-major and recover the ~42 ms the GN stats fusions
burn at 15-90 GB/s (GroupNorm32 docstring, round-3 stats-kernel study)?

Grid: CONV_IMPL x GN_IMPL over the full UNetSD_T2VBase forward at the
bench shape (batched CFG: 2 x 16f @ 32x56 latent, bf16). The prior
negative results wired Pallas GN while convs still owned the layout;
this is the "own the convs too" arm.

Run on the TPU: python tools_dev/profile_layout_flip.py

RESULT (TPU v5 lite, 2026-08-17): NEGATIVE — defaults stay xla+flax.
    conv=xla    gn=flax :  191.90 ms/fwd   <- best
    conv=xla    gn=stats:  203.96 ms/fwd
    conv=matmul gn=flax :  200.04 ms/fwd
    conv=matmul gn=stats:  233.37 ms/fwd
The shifted-matmul formulation loses ~8 ms on its own (9 taps re-read
the padded activation from HBM; XLA's conv lowering keeps the halo in
registers/VMEM), and even with convs out of the picture the Pallas GN
stats kernels still lose — layout assignment stays batch-minor because
the attention reshapes and the temporal transposes also vote, so the
relayout copies around the custom-calls persist. Conclusion recorded in
the GroupNorm32 docstring: XLA's fused GN is the wall, ~42 ms of the
192 ms forward, and it is not recoverable by re-expressing the convs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import vgen_tpu  # noqa: F401
from vgen_tpu.core import MODEL, default_cfg
from vgen_tpu.models import blocks


def build():
    cfg = default_cfg()
    ucfg = dict(cfg.UNet, type="UNetSD_T2VBase", out_dim=4)
    model = MODEL.build(ucfg, dtype=jnp.bfloat16)
    lat_h, lat_w = 32, 56
    x0 = jnp.zeros((1, 2, lat_h, lat_w, 4))
    t0 = jnp.zeros((1,), jnp.int32)
    y0 = jnp.zeros((1, 77, 1024))
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x0, t0,
                                        y=y0))()
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, 16, lat_h, lat_w, 4)).astype(jnp.bfloat16)
    y = jax.random.normal(jax.random.PRNGKey(2),
                          (2, 77, 1024)).astype(jnp.bfloat16)
    tt = jnp.asarray([500, 500])
    return model, params, x, y, tt


def main():
    model, params, x, y, tt = build()
    results = {}
    base_out = None
    for conv in ("xla", "matmul"):
        for gn in ("flax", "stats"):
            blocks.CONV_IMPL, blocks.GN_IMPL = conv, gn
            fwd = jax.jit(lambda p, x: model.apply(p, x, tt, y=y))
            t0 = time.time()
            o = fwd(params, x)
            m = float(np.asarray(o.astype(jnp.float32).mean()))
            compile_s = time.time() - t0
            n = 20
            t0 = time.time()
            for _ in range(n):
                o = fwd(params, x)
            _ = float(np.asarray(o.astype(jnp.float32).mean()))
            dt = (time.time() - t0) / n
            if base_out is None:
                base_out = np.asarray(o.astype(jnp.float32))
                err = 0.0
            else:
                err = float(np.max(np.abs(
                    np.asarray(o.astype(jnp.float32)) - base_out)))
            results[f"{conv}+{gn}"] = dt
            print(f"conv={conv:6s} gn={gn:5s}: {dt * 1e3:7.2f} ms/fwd"
                  f"  (compile {compile_s:5.1f} s, mean {m:+.5f},"
                  f" maxdiff-vs-base {err:.4f})", flush=True)
    base = results["xla+flax"]
    best = min(results, key=results.get)
    print(f"\nbest: {best} at {results[best] * 1e3:.2f} ms"
          f" ({base / results[best]:.3f}x vs xla+flax)")


if __name__ == "__main__":
    main()
