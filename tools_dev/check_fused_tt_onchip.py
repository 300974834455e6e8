"""On-chip fused-TT parity: real Mosaic compile + execute, fused vs flax.

The CPU suite proves the kernels in Pallas INTERPRETER mode
(tests/test_fused_tt.py); this script closes the loop the headline bench
number rides on (VERDICT r4 weak #6 / ADVICE r4): it compiles the fused
kernels with the REAL Mosaic pipeline at every dispatchable hot shape of
the model zoo and checks the outputs against the unfused flax modules on
the same params, on the same chip.

Shapes: (f, c, heads) covering the base 448x256 workload (c320 mega,
c512 stem, c640 split), the 8/32-frame buckets, and the 720p i2vgen
shape (c320/c640 at BHW 14080 tiles). dim_head is 64 everywhere in the
model zoo — the only dispatchable value (ops/fused_tt.py fusable()).

Prints one JSON line {"results": [...], "ok": bool}; exit 1 on failure.
Run: python tools_dev/check_fused_tt_onchip.py
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
from vgen_tpu.ops import fused_tt
from tests.test_fused_tt import _make_inner_params  # noqa: E402

# (f, c, heads, bhw): every (f, c) the fused dispatch can see in the
# shipped configs; bhw values hit both small and 720p-scale grids with
# ragged (padded) row counts.
SHAPES = [
    (16, 320, 5, 3584),    # base t2v c320 mega-kernel (2*32*56)
    (16, 512, 8, 1792),    # stem TT inner 512 (proj_out 320)
    (16, 640, 10, 896),    # base c640 split kernels (2*16*28)
    (8, 320, 5, 1000),     # 8-frame bucket, ragged rows
    (32, 320, 5, 500),     # 32-frame bucket (tft2v 32f)
    (16, 320, 5, 14080),   # i2vgen 720p scale-1 (88*160)
    (16, 640, 10, 3520),   # i2vgen 720p scale-2 (44*80)
    (1, 320, 5, 512),      # image batch (f=1 band)
]
TOL = 2e-2  # bf16 accumulation-order difference bound (same as CPU suite)


def main():
    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"needs the TPU chip, got {dev}"
    results, ok = [], True
    for f, c, heads, bhw in SHAPES:
        c_out = 320 if c == 512 else c
        params, ref_fn = _make_inner_params(
            jax.random.PRNGKey(hash((f, c)) % 2**31), c, heads, 64, c_out)
        x = (jax.random.normal(jax.random.PRNGKey(1), (bhw, f, c))
             * 0.5).astype(jnp.bfloat16)
        want = np.asarray(jax.jit(ref_fn)(params, x), np.float32)
        t0 = time.time()
        fused = jax.jit(lambda p, xx: fused_tt.fused_tt_inner(
            xx, p, heads=heads, dim_head=64))
        got = np.asarray(fused(params, x), np.float32)
        dt = time.time() - t0
        rel = float(np.abs(got - want).max() / max(np.abs(want).max(), 1e-6))
        results.append({"f": f, "c": c, "bhw": bhw,
                        "rel_err": round(rel, 5),
                        "compile_run_s": round(dt, 1)})
        ok = ok and rel < TOL and np.isfinite(got).all()
        print(f"# f{f} c{c} bhw{bhw}: rel {rel:.2e} ({dt:.1f}s)",
              file=sys.stderr, flush=True)
    print(json.dumps({"device": str(dev), "tol": TOL,
                      "results": results, "ok": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
