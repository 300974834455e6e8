"""On-chip fused-TemporalConvBlock parity: real Mosaic compile, fused vs
flax (same role as check_fused_tt_onchip.py, for ops/fused_tconv.py).

Shapes: every (f, c, h, w) the fused dispatch can see in the shipped
configs — the base 448x256 workload (c320 at 32x56, c640 at 16x28), the
8/32-frame buckets, and the 720p i2vgen grids (88x160 c320, 44x80 c640).

Prints one JSON line {"results": [...], "ok": bool}; exit 1 on failure.
Run: python tools_dev/check_fused_tconv_onchip.py
"""
import json
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
from tests.test_fused_tconv import _make_block  # noqa: E402

# the module path auto-fuses ON TPU — force the reference side unfused
# (without this the check compares the kernel to itself: rel == 0.0)
blocks.FUSED_TCONV = "off"

# (b, f, h, w, c): dispatchable shapes of the model zoo (CFG-batched base
# at b=2, sequential-CFG 720p at b=1).
SHAPES = [
    (2, 16, 32, 56, 320),   # base t2v level 1
    (2, 16, 16, 28, 640),   # base t2v level 2
    (1, 8, 32, 56, 320),    # 8-frame bucket
    (1, 32, 16, 28, 320),   # 32-frame bucket (tft2v)
    (1, 16, 88, 160, 320),  # i2vgen 720p level 1
    (1, 16, 44, 80, 640),   # i2vgen 720p level 2
]
TOL = 2e-2


def main():
    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"needs the TPU chip, got {dev}"
    results, ok = [], True
    for shape in SHAPES:
        b, f, h, w, c = shape
        tc, params, x = _make_block(
            jax.random.PRNGKey(hash(shape) % 2**31), shape)
        assert fused_tconv.fusable(f, c, h * w, x.dtype), shape
        want = np.asarray(jax.jit(tc.apply)(params, x), np.float32)
        t0 = time.time()
        fused = jax.jit(lambda p, xx: fused_tconv.fused_temporal_conv_chain(
            xx, p["params"]))
        got = np.asarray(fused(params, x), np.float32)
        dt = time.time() - t0
        rel = float(np.abs(got - want).max() / max(np.abs(want).max(), 1e-6))
        results.append({"shape": list(shape), "rel_err": round(rel, 5),
                        "compile_run_s": round(dt, 1)})
        ok = bool(ok and rel < TOL and np.isfinite(got).all())
        print(f"# {shape}: rel {rel:.2e} ({dt:.1f}s)",
              file=sys.stderr, flush=True)
    print(json.dumps({"device": str(dev), "tol": TOL,
                      "results": results, "ok": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
