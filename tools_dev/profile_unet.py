import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
import vgen_tpu
from vgen_tpu.core import MODEL, AUTO_ENCODER, default_cfg

cfg = default_cfg()
cfg.UNet = dict(cfg.UNet, type="UNetSD_T2VBase", out_dim=4)
dtype = jnp.bfloat16
model = MODEL.build(dict(cfg.UNet), dtype=dtype)
ae = AUTO_ENCODER.build(dict(cfg.auto_encoder), dtype=dtype)
key = jax.random.PRNGKey(0)
lat_h, lat_w = 32, 56
x0 = jnp.zeros((1, 2, lat_h, lat_w, 4)); t0 = jnp.zeros((1,), jnp.int32); y0 = jnp.zeros((1, 77, 1024))
params = jax.jit(lambda: model.init(key, x0, t0, y=y0))()
ae.init_random(jax.random.PRNGKey(1), image_size=64)

x = jnp.zeros((2, 16, lat_h, lat_w, 4), jnp.bfloat16)
y = jnp.zeros((2, 77, 1024), jnp.bfloat16)
tt = jnp.asarray([500, 500])
fwd = jax.jit(lambda p, x: model.apply(p, x, tt, y=y))
lowered = fwd.lower(params, x); comp = lowered.compile()
ca = comp.cost_analysis() or {}
print(f"# UNet fwd flops: {ca.get('flops',0)/1e12:.3f} TFLOP, bytes: {ca.get('bytes accessed',0)/1e9:.2f} GB")
o = jax.block_until_ready(fwd(params, x))
t0_ = time.time()
N = 20
for _ in range(N):
    o = jax.block_until_ready(fwd(params, x))
dt = (time.time() - t0_) / N
print(f"UNet fwd (b2,f16,32x56): {dt*1e3:.1f} ms, {ca.get('flops',0)/dt/1e12:.1f} TFLOP/s")

lat = jnp.zeros((8, lat_h, lat_w, 4), jnp.bfloat16)
dec = jax.jit(lambda p, z: ae.module.apply(p, z, method="decode_latent"))
dca = (dec.lower(ae.params, lat).compile().cost_analysis() or {})
o = jax.block_until_ready(dec(ae.params, lat))
t0_ = time.time()
for _ in range(10):
    o = jax.block_until_ready(dec(ae.params, lat))
ddt = (time.time() - t0_) / 10
print(f"VAE decode 8f: {ddt*1e3:.1f} ms ({dca.get('flops',0)/1e12:.2f} TFLOP, {dca.get('flops',0)/ddt/1e12:.1f} TFLOP/s)")
print(f"# extrapolated video: 50*{dt*1e3:.0f}ms + {2*ddt:.2f}s = {50*dt+2*ddt:.2f}s")
