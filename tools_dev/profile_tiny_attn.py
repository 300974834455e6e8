"""Is the dense temporal-attention path (S=16, huge batch) HBM-bound on
padded scores? Times _dense_fwd at the c320 inference shape."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from vgen_tpu.ops.attention import _dense_fwd

N = 50
BH, S, D = 17920, 16, 64
rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(BH, S, D), jnp.bfloat16)
k = jnp.asarray(rng.randn(BH, S, D), jnp.bfloat16)
v = jnp.asarray(rng.randn(BH, S, D), jnp.bfloat16)
scale = D ** -0.5

def run(q, k, v):
    def step(c, _):
        o, lse = _dense_fwd(q + c, k, v, scale)
        return (jnp.sum(o.astype(jnp.float32)) * 1e-30).astype(q.dtype), None
    acc, _ = jax.lax.scan(step, jnp.zeros((), q.dtype), None, length=N)
    return acc

c = jax.jit(run).lower(q, k, v).compile()
np.asarray(c(q, k, v))
t0 = time.time(); np.asarray(c(q, k, v)); dt = (time.time() - t0) / N
useful = 4 * BH * S * S * D
bytes_unpadded = (3 * q.size + q.size) * 2 + BH*S*S*4*2
print(f"dense S=16 BH=17920: {dt*1e3:.3f} ms  "
      f"({useful/dt/1e12:.2f} TF/s useful; min-traffic {bytes_unpadded/1e6:.0f} MB -> {bytes_unpadded/dt/1e9:.0f} GB/s)")

# tiny packed kernel at the same shape
from vgen_tpu.ops.attention import _tiny_fwd_tpu, _tiny_bwd_tpu
o, lse = jax.jit(lambda q, k, v: _tiny_fwd_tpu(q, k, v, scale))(q, k, v)
do = jnp.asarray(rng.randn(BH, S, D), jnp.bfloat16)

def run_tiny(q, k, v):
    def step(c, _):
        o2, _ = _tiny_fwd_tpu(q + c, k, v, scale)
        return (jnp.sum(o2.astype(jnp.float32)) * 1e-30).astype(q.dtype), None
    acc, _ = jax.lax.scan(step, jnp.zeros((), q.dtype), None, length=N)
    return acc

c2 = jax.jit(run_tiny).lower(q, k, v).compile()
np.asarray(c2(q, k, v))
t0 = time.time(); np.asarray(c2(q, k, v)); dt2 = (time.time() - t0) / N
print(f"tiny  S=16 BH=17920 fwd: {dt2*1e3:.3f} ms  speedup {1.186/max(dt2*1e3,1e-9)*1e-3*1e3:.2f}x")

def run_tbwd(q, k, v, do):
    def step(c, _):
        g = _tiny_bwd_tpu(q + c, k, v, o, lse, do, scale)
        return (sum(jnp.sum(x.astype(jnp.float32)) for x in g) * 1e-30).astype(q.dtype), None
    acc, _ = jax.lax.scan(step, jnp.zeros((), q.dtype), None, length=N)
    return acc

c3 = jax.jit(run_tbwd).lower(q, k, v, do).compile()
np.asarray(c3(q, k, v, do))
t0 = time.time(); np.asarray(c3(q, k, v, do)); dt3 = (time.time() - t0) / N
print(f"tiny  S=16 BH=17920 bwd: {dt3*1e3:.3f} ms")

# what training used before at this shape: the jnp fallback backward
from vgen_tpu.ops.attention import _flash_bwd
def run_jbwd(q, k, v, do):
    def step(c, _):
        g = _flash_bwd(q + c, k, v, o, lse, do, scale)
        return (sum(jnp.sum(x.astype(jnp.float32)) for x in g) * 1e-30).astype(q.dtype), None
    acc, _ = jax.lax.scan(step, jnp.zeros((), q.dtype), None, length=N)
    return acc
c4 = jax.jit(run_jbwd).lower(q, k, v, do).compile()
np.asarray(c4(q, k, v, do))
t0 = time.time(); np.asarray(c4(q, k, v, do)); dt4 = (time.time() - t0) / N
print(f"jnp   S=16 BH=17920 bwd: {dt4*1e3:.3f} ms")
