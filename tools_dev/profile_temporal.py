import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp
from flax import linen as nn
import vgen_tpu
from vgen_tpu.models.blocks import TemporalTransformer, GroupNorm32, zeros_init

B, F, H, W, C = 2, 16, 32, 56, 320
HEADS, D = 5, 64

class TemporalEinsum(nn.Module):
    """Transpose-free temporal transformer variant: x stays [b,f,s,c];
    attention contracts over f with (b,s,head) as dot batch dims."""
    heads: int
    dim_head: int
    dtype: any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        xx = GroupNorm32(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        xx = xx.reshape(b, f, h * w, c)
        xx = nn.Dense(inner, dtype=self.dtype, name="proj_in")(xx)
        # block: LN + self-attn + LN + self-attn + LN + FF (layout-agnostic)
        def attn(name, t):
            hN = nn.LayerNorm(dtype=self.dtype, name=f"{name}_ln")(t)
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name=f"{name}_q")(hN)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name=f"{name}_k")(hN)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name=f"{name}_v")(hN)
            q = q.reshape(b, f, h * w, self.heads, self.dim_head)
            k = k.reshape(b, f, h * w, self.heads, self.dim_head)
            v = v.reshape(b, f, h * w, self.heads, self.dim_head)
            s = jnp.einsum("bfshd,bgshd->bshfg", q, k,
                           preferred_element_type=jnp.float32) * (self.dim_head ** -0.5)
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            o = jnp.einsum("bshfg,bgshd->bfshd", p, v)
            o = o.reshape(b, f, h * w, inner)
            return t + nn.Dense(inner, dtype=self.dtype, name=f"{name}_out")(o)
        xx = attn("attn1", xx)
        xx = attn("attn2", xx)
        hN = nn.LayerNorm(dtype=self.dtype, name="ff_ln")(xx)
        g = nn.Dense(inner * 8, dtype=self.dtype, name="ff_in")(hN)
        a, gate = jnp.split(g, 2, axis=-1)
        hN = a * nn.gelu(gate)
        xx = xx + nn.Dense(inner, dtype=self.dtype, name="ff_out")(hN)
        xx = nn.Dense(c, kernel_init=zeros_init, bias_init=zeros_init,
                      dtype=self.dtype, name="proj_out")(xx)
        return x_in + xx.reshape(b, f, h, w, c)

def bench(name, module, x):
    p = jax.jit(lambda: module.init(jax.random.PRNGKey(0), x))()
    fwd = jax.jit(lambda p, x: module.apply(p, x))
    ca = fwd.lower(p, x).compile().cost_analysis() or {}
    o = jax.block_until_ready(fwd(p, x))
    host = float(jnp.asarray(o).astype(jnp.float32).mean())  # force full sync
    t0 = time.time(); n = 20
    for _ in range(n):
        o = fwd(p, x)
    host = float(o.astype(jnp.float32).mean())
    dt = (time.time() - t0) / n
    print(f"{name:22s}: {dt*1e3:6.2f} ms  {ca.get('bytes accessed',0)/1e9:6.2f} GB  {ca.get('flops',0)/1e12:5.2f} TF")

x = jnp.zeros((B, F, H, W, C), jnp.bfloat16)
cur = TemporalTransformer(heads=HEADS, dim_head=D, dtype=jnp.bfloat16)
new = TemporalEinsum(heads=HEADS, dim_head=D, dtype=jnp.bfloat16)
bench("current (transpose)", cur, x)
bench("einsum (no transpose)", new, x)
