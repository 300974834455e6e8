import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
import vgen_tpu
from vgen_tpu.models.blocks import ResBlock, SpatialTransformer, TemporalTransformer

BF, H, W = 32, 32, 56

def bench(name, apply_fn, params, x, n=30):
    @jax.jit
    def many(p, x0):
        def step(x, _):
            return apply_fn(p, x).astype(x0.dtype), ()
        out, _ = jax.lax.scan(step, x0, None, length=n)
        return out
    o = jax.block_until_ready(many(params, x)); _=float(o.astype(jnp.float32).mean())
    t0 = time.time(); o = many(params, x); _=float(o.astype(jnp.float32).mean())
    dt = (time.time()-t0)/n
    print(f"{name:36s}: {dt*1e3:6.2f} ms/block")

def res_case(c, h, w, label):
    x = jnp.zeros((BF, h, w, c), jnp.bfloat16)
    emb = jnp.zeros((BF, 1280), jnp.bfloat16)
    m = ResBlock(out_channels=c, dtype=jnp.bfloat16)
    p = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x, emb, 16))()
    bench(label, lambda p, x: m.apply(p, x, emb, 16), p, x)

def spat_case(c, h, w, label):
    x = jnp.zeros((BF, h, w, c), jnp.bfloat16)
    ctx = jnp.zeros((BF, 77, 1024), jnp.bfloat16)
    m = SpatialTransformer(heads=c//64, dim_head=64, dtype=jnp.bfloat16)
    p = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x, ctx))()
    bench(label, lambda p, x: m.apply(p, x, ctx), p, x)

def temp_case(c, h, w, label):
    x = jnp.zeros((2, 16, h, w, c), jnp.bfloat16)
    m = TemporalTransformer(heads=c//64, dim_head=64, dtype=jnp.bfloat16)
    p = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
    bench(label, lambda p, x: m.apply(p, x), p, x)

res_case(320, 32, 56, "ResBlock c320 @32x56")
res_case(640, 16, 28, "ResBlock c640 @16x28")
res_case(1280, 8, 14, "ResBlock c1280 @8x14")
spat_case(320, 32, 56, "SpatialTransformer c320 @32x56")
spat_case(640, 16, 28, "SpatialTransformer c640 @16x28")
temp_case(320, 32, 56, "TemporalTransformer c320 @32x56")
temp_case(640, 16, 28, "TemporalTransformer c640 @16x28")
