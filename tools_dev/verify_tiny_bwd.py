"""On-chip grads of the S=16 (temporal) attention path vs dense
autodiff: the custom_vjp now routes tiny shapes to the packed Pallas
backward."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from vgen_tpu.ops.attention import _attention_bhsd

def naive(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))

# f32 tol reflects TPU default matmul precision (bf16 MXU passes);
# exact math is covered by the CPU interpret-mode tests
for dtype, tol in ((jnp.float32, 2e-2), (jnp.bfloat16, 5e-2)):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(37, 16, 64), dtype)   # ragged batch
    k = jnp.asarray(rng.randn(37, 16, 64), dtype)
    v = jnp.asarray(rng.randn(37, 16, 64), dtype)
    scale = 64 ** -0.5
    g = jax.jit(jax.grad(lambda q,k,v: _attention_bhsd(q,k,v,scale).astype(jnp.float32).sum(), argnums=(0,1,2)))
    ge = jax.jit(jax.grad(lambda q,k,v: naive(q,k,v,scale).sum(), argnums=(0,1,2)))
    for a, b, name in zip(g(q,k,v), ge(q,k,v), ("dq","dk","dv")):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.isfinite(a).all(), name
        err = np.abs(a-b).max() / (np.abs(b).max() + 1e-6)
        print(f"{np.dtype(dtype).name} {name}: rel-max-err {err:.2e}")
        assert err < tol, (name, err)
print("TINY BWD ON-CHIP: grads match dense autodiff")
