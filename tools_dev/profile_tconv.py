import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from flax import linen as nn
import vgen_tpu
from vgen_tpu.models.blocks import TemporalConvBlock, GroupNorm32

B, F, H, W, C = 2, 16, 32, 56, 320

def bench(name, fn, p, x):
    fwd = jax.jit(fn)
    ca = fwd.lower(p, x).compile().cost_analysis() or {}
    o = jax.block_until_ready(fwd(p, x)); _ = float(o.astype(jnp.float32).mean())
    t0 = time.time(); n = 30
    for _ in range(n): o = fwd(p, x)
    _ = float(o.astype(jnp.float32).mean())
    dt = (time.time()-t0)/n
    print(f"{name:28s}: {dt*1e3:6.2f} ms  {ca.get('bytes accessed',0)/1e9:6.2f} GB  {ca.get('flops',0)/1e12:5.3f} TF")
    return dt

x = jnp.zeros((B, F, H, W, C), jnp.bfloat16)

# current: full TemporalConvBlock (4x GN-SiLU-Conv3D(3,1,1))
cur = TemporalConvBlock(dtype=jnp.bfloat16)
p = jax.jit(lambda: cur.init(jax.random.PRNGKey(0), x))()
bench("TemporalConvBlock (3D conv)", lambda p, x: cur.apply(p, x), p, x)

# variant A: single Conv3D(3,1,1)
class Conv3D1(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Conv(C, (3,1,1), padding=((1,1),(0,0),(0,0)), dtype=jnp.bfloat16)(x)
m = Conv3D1(); pp = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
bench("single Conv3D(3,1,1)", lambda p, x: m.apply(p, x), pp, x)

# variant B: reshape [b,f,hw,c] + Conv2D (3,1)
class Conv2D31(nn.Module):
    @nn.compact
    def __call__(self, x):
        b,f,h,w,c = x.shape
        v = x.reshape(b, f, h*w, c)
        v = nn.Conv(C, (3,1), padding=((1,1),(0,0)), dtype=jnp.bfloat16)(v)
        return v.reshape(b,f,h,w,c)
m2 = Conv2D31(); pp2 = jax.jit(lambda: m2.init(jax.random.PRNGKey(0), x))()
bench("reshape + Conv2D(3,1)", lambda p, x: m2.apply(p, x), pp2, x)

# variant C: shift + 3 matmuls (einsum over c)
class ShiftMM(nn.Module):
    @nn.compact
    def __call__(self, x):
        b,f,h,w,c = x.shape
        wgt = self.param("w", nn.initializers.lecun_normal(), (3, c, C))
        bia = self.param("b", nn.initializers.zeros, (C,))
        v = x.reshape(b, f, h*w, c)
        prev = jnp.concatenate([jnp.zeros_like(v[:, :1]), v[:, :-1]], axis=1)
        nxt = jnp.concatenate([v[:, 1:], jnp.zeros_like(v[:, :1])], axis=1)
        wb = wgt.astype(jnp.bfloat16)
        o = (jnp.einsum('bfsc,cd->bfsd', prev, wb[0], preferred_element_type=jnp.float32)
             + jnp.einsum('bfsc,cd->bfsd', v, wb[1], preferred_element_type=jnp.float32)
             + jnp.einsum('bfsc,cd->bfsd', nxt, wb[2], preferred_element_type=jnp.float32))
        return (o + bia).astype(jnp.bfloat16).reshape(b,f,h,w,C)
m3 = ShiftMM(); pp3 = jax.jit(lambda: m3.init(jax.random.PRNGKey(0), x))()
bench("shift + matmuls", lambda p, x: m3.apply(p, x), pp3, x)

# variant D: GN+SiLU alone (cost of the norm chain)
class GNS(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.silu(GroupNorm32(dtype=jnp.bfloat16, name="n")(x))
m4 = GNS(); pp4 = jax.jit(lambda: m4.init(jax.random.PRNGKey(0), x))()
bench("GN+SiLU alone", lambda p, x: m4.apply(p, x), pp4, x)

# variant E: spatial Conv2D 3x3 (ResBlock main conv) for comparison
class SConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        b,f,h,w,c = x.shape
        v = x.reshape(b*f, h, w, c)
        v = nn.Conv(C, (3,3), padding=1, dtype=jnp.bfloat16)(v)
        return v.reshape(b,f,h,w,c)
m5 = SConv(); pp5 = jax.jit(lambda: m5.init(jax.random.PRNGKey(0), x))()
bench("spatial Conv2D 3x3", lambda p, x: m5.apply(p, x), pp5, x)
