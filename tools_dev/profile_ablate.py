import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
import vgen_tpu
from vgen_tpu.core import MODEL, default_cfg

def bench(name, ucfg_over, dtype=jnp.bfloat16, cast_params=False):
    cfg = default_cfg()
    ucfg = dict(cfg.UNet, type="UNetSD_T2VBase", out_dim=4, **ucfg_over)
    model = MODEL.build(ucfg, dtype=dtype)
    lat_h, lat_w = 32, 56
    x0 = jnp.zeros((1, 2, lat_h, lat_w, 4)); t0 = jnp.zeros((1,), jnp.int32); y0 = jnp.zeros((1, 77, 1024))
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x0, t0, y=y0))()
    if cast_params:
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    x = jnp.zeros((2, 16, lat_h, lat_w, 4), jnp.bfloat16)
    y = jnp.zeros((2, 77, 1024), jnp.bfloat16)
    tt = jnp.asarray([500, 500])
    fwd = jax.jit(lambda p, x: model.apply(p, x, tt, y=y))
    ca = fwd.lower(params, x).compile().cost_analysis() or {}
    o = jax.block_until_ready(fwd(params, x))
    t0_ = time.time()
    for _ in range(15):
        o = jax.block_until_ready(fwd(params, x))
    dt = (time.time() - t0_) / 15
    print(f"{name:34s}: {dt*1e3:7.1f} ms  {ca.get('flops',0)/1e12:6.2f} TF  "
          f"{ca.get('bytes accessed',0)/1e9:7.1f} GB  {ca.get('flops',0)/dt/1e12:5.1f} TF/s")
    return dt

bench("full (baseline)", {})
bench("params cast bf16", {}, cast_params=True)
bench("no temporal transformer", {"temporal_attention": False})
bench("no spatial attention", {"attn_scales": []})
bench("no attn at scale 1.0", {"attn_scales": [0.5, 0.25]})
