"""Does BATCHED CFG at 720p i2vgen fit 16 GB now? Compile-only memory
analysis of the 5-step denoise segment with cond+uncond in one batch-2
UNet call vs the shipped sequential variant."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, yaml

import vgen_tpu  # noqa: F401
from vgen_tpu.core import AUTO_ENCODER, DIFFUSION, MODEL, default_cfg

cfg = default_cfg()
train = yaml.safe_load(open("configs/i2vgen_xl_train.yaml"))
cfg.UNet = dict(train["UNet"])
cfg.Diffusion = dict(train["Diffusion"])
dtype = jnp.bfloat16
model = MODEL.build(dict(cfg.UNet), dtype=dtype)
diffusion = DIFFUSION.build(dict(cfg.Diffusion))
f, lh, lw = 16, 88, 160

x0 = jnp.zeros((1, 2, lh, lw, 4)); t0 = jnp.zeros((1,), jnp.int32)
y0 = jnp.zeros((1, 77, 1024))
from vgen_tpu.engines.infer_t2v import model_init_kwargs
cfg.update({"max_frames": 16, "resolution": [1280, 704], "scale": 8})
ikw = model_init_kwargs(cfg, lh, lw, frames=2)
params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x0, t0, y=y0, **ikw))()
params = jax.tree.map(lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)

y = jnp.zeros((1, 77, 1024)); yn = jnp.zeros((1, 77, 1024))
yv = jnp.zeros((1, 1024)); fps = jnp.zeros((1,), jnp.int32)
li = jnp.zeros((1, f, lh, lw, 4))

def seg(params, xt, steps, mode):
    def model_fn(x, t):
        tb = jnp.broadcast_to(t, (x.shape[0],)) if t.ndim == 0 else t
        if mode == "seq":
            a = model.apply(params, x, tb, y=y, image=yv, local_image=li, fps=fps)
            b = model.apply(params, x, tb, y=yn, image=jnp.zeros_like(yv), local_image=li, fps=fps)
        else:
            x2 = jnp.concatenate([x, x], 0); t2 = jnp.concatenate([tb, tb], 0)
            ctx = jnp.concatenate([y, yn], 0)
            img = jnp.concatenate([yv, jnp.zeros_like(yv)], 0)
            li2 = jnp.concatenate([li, li], 0); f2 = jnp.concatenate([fps, fps], 0)
            out = model.apply(params, x2, t2, y=ctx, image=img, local_image=li2, fps=f2)
            a, b = jnp.split(out, 2, 0)
        return diffusion.classifier_free_guidance(a, b, 9.0)
    return diffusion.ddim_sample_scan(jax.random.PRNGKey(1), xt, steps, model_fn, ddim_timesteps=50)

xt = jnp.zeros((1, f, lh, lw, 4)); steps = jnp.zeros((5,), jnp.int32)
for mode in ("seq", "batched"):
    c = jax.jit(lambda p, x, s, m=mode: seg(p, x, s, m)).lower(params, xt, steps).compile()
    ma = c.memory_analysis()
    tot = (ma.temp_size_in_bytes + ma.argument_size_in_bytes + ma.output_size_in_bytes) / 1e9
    print(f"{mode:8s}: temp {ma.temp_size_in_bytes/1e9:.2f} GB  total {tot:.2f} GB  "
          f"flops {c.cost_analysis()[0].get('flops', 0)/1e12 if isinstance(c.cost_analysis(), list) else c.cost_analysis().get('flops',0)/1e12:.0f} TF", flush=True)

# timing: one 5-step segment, real execution (np.asarray forces completion)
import time
import numpy as np
xt_r = jax.random.normal(jax.random.PRNGKey(7), (1, f, lh, lw, 4), jnp.float32)
for mode in ("seq", "batched"):
    c = jax.jit(lambda p, x, s, m=mode: seg(p, x, s, m)).lower(params, xt, steps).compile()
    st = jnp.asarray(np.array([981, 961, 941, 921, 901]), jnp.int32)
    np.asarray(c(params, xt_r, st))  # warmup
    t0 = time.time(); np.asarray(c(params, xt_r, st)); dt = time.time() - t0
    print(f"{mode:8s}: {dt:.2f} s / 5-step segment  ({50/5*dt:.1f} s per 50 steps)", flush=True)
