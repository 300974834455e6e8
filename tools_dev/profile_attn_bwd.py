"""Profile flash-attention backward: Pallas kernels vs the jnp
nested-scan fallback, at the training hot shapes (VERDICT r1 #5).

Shapes (t2v_train 16-frame 448x256, batch 4, reference
configs/t2v_train.yaml:66-72):
  * spatial L0: BH = (b*f=64) * heads(320/64=5) = 320, S = 56*32 = 1792
  * spatial L1: BH = 64 * 10 = 640, S = 28*16 = 448
  * temporal:   BH = b*h*w*heads = 4*56*32*5 = 35840, S = f = 16
                (dense path — measured for completeness)

Device-side timing: each variant scanned N times inside one jit (tunnel
per-call overhead is large — see .claude/skills/verify).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vgen_tpu.ops.attention import (_dense_fwd, _flash_bwd, _flash_bwd_tpu,
                                    _flash_fwd_tpu)

N = int(os.environ.get("PROF_N", 20))
DTYPE = jnp.bfloat16 if os.environ.get("PROF_BF16", "1") == "1" else jnp.float32


def timeit(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    np.asarray(c(*args))  # warmup; np.asarray forces REAL completion —
    # through the axon tunnel block_until_ready alone misreports
    t0 = time.time()
    np.asarray(c(*args))
    return (time.time() - t0) / N


def scanned(body):
    """Device-side timing loop. The carry perturbs the first input each
    iteration — without this the body is loop-invariant and XLA hoists
    it out of the scan entirely (observed: 0.005 ms 'timings')."""
    def run(*args):
        def step(c, _):
            out = body(args[0] + c, *args[1:])
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in out)
            return (s * 1e-30).astype(args[0].dtype), None
        acc, _ = jax.lax.scan(step, jnp.zeros((), args[0].dtype), None,
                              length=N)
        return acc
    return run


def profile_shape(name, bh, s, d=64):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, s, d), DTYPE)
    k = jnp.asarray(rng.randn(bh, s, d), DTYPE)
    v = jnp.asarray(rng.randn(bh, s, d), DTYPE)
    do = jnp.asarray(rng.randn(bh, s, d), DTYPE)
    scale = d ** -0.5

    o, lse = jax.jit(lambda q, k, v: _flash_fwd_tpu(q, k, v, scale))(q, k, v)

    t_fwd = timeit(scanned(
        lambda q, k, v, *_: _flash_fwd_tpu(q, k, v, scale)), q, k, v, do)
    t_pl = timeit(scanned(
        lambda q, k, v, do: _flash_bwd_tpu(q, k, v, o, lse, do, scale)),
        q, k, v, do)
    t_jnp = timeit(scanned(
        lambda q, k, v, do: _flash_bwd(q, k, v, o, lse, do, scale)),
        q, k, v, do)

    flops_fwd = 4 * bh * s * s * d
    flops_bwd = 10 * bh * s * s * d  # 5 matmuls, 2x flops each
    print(f"{name}: BH={bh} S={s} D={d} {DTYPE.__name__}\n"
          f"  fwd pallas  {t_fwd*1e3:8.3f} ms  "
          f"{flops_fwd/t_fwd/1e12:6.1f} TFLOP/s\n"
          f"  bwd pallas  {t_pl*1e3:8.3f} ms  "
          f"{flops_bwd/t_pl/1e12:6.1f} TFLOP/s\n"
          f"  bwd jnp     {t_jnp*1e3:8.3f} ms  "
          f"{flops_bwd/t_jnp/1e12:6.1f} TFLOP/s   "
          f"speedup {t_jnp/t_pl:.2f}x", flush=True)


if __name__ == "__main__":
    profile_shape("spatial-L0", bh=320, s=1792)
    profile_shape("spatial-L1", bh=640, s=448)
