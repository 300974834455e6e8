"""Verify the NEW Pallas attention backward on the REAL chip: grads of
the flash path vs autodiff through a dense oracle, bf16+f32, hot shape."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from vgen_tpu.ops.attention import _attention_bhsd, _dense_fwd

def naive(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))

for dtype, tol in ((jnp.float32, 2e-3), (jnp.bfloat16, 3e-2)):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(8, 500, 64), dtype)   # ragged: pads to 512
    k = jnp.asarray(rng.randn(8, 500, 64), dtype)
    v = jnp.asarray(rng.randn(8, 500, 64), dtype)
    scale = 64 ** -0.5
    g = jax.jit(jax.grad(lambda q,k,v: _attention_bhsd(q,k,v,scale).astype(jnp.float32).sum(), argnums=(0,1,2)))
    dq, dk, dv = g(q, k, v)
    ge = jax.jit(jax.grad(lambda q,k,v: naive(q,k,v,scale).sum(), argnums=(0,1,2)))
    eq, ek, ev = ge(q, k, v)
    for a, b, name in ((dq,eq,'dq'), (dk,ek,'dk'), (dv,ev,'dv')):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.isfinite(a).all(), name
        err = np.abs(a-b).max() / (np.abs(b).max() + 1e-6)
        print(f"{np.dtype(dtype).name} {name}: rel-max-err {err:.2e}")
        assert err < tol, (name, err)
print("PALLAS BWD ON-CHIP: all grads match dense autodiff")
