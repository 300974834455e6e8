"""Cold-compile cost of the base t2v generate program (BENCH record 1).

Measures `generate.lower().compile()` seconds with a FRESH compilation
cache dir, with the fused TT kernel on vs off, to attribute the r4
compile-time regression (VERDICT r4 weak #1: r3 cold base compile 118s;
r4 driver's base record consumed the whole 870 s budget).

Usage:  python tools_dev/compile_cold.py [on|off]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "on"
if mode == "off":
    os.environ["VGEN_FUSED_TT"] = "off"

import jax
import jax.numpy as jnp

cache = tempfile.mkdtemp(prefix="jaxcache_cold_")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

t_imp = time.time()
dev = jax.devices()[0]
print(f"# device {dev} (backend up {time.time()-t_imp:.0f}s)", flush=True)

from vgen_tpu.core import AUTO_ENCODER, DIFFUSION, MODEL, default_cfg
from vgen_tpu.engines.infer_t2v import make_generate_fn

cfg = default_cfg()
# PERTURB_GS nudges guide_scale -> a never-before-seen HLO, defeating any
# server-side compile cache the tunnel might keep (client cache is
# already fresh via the tempdir): the only way to observe a TRUE cold
# compile of a program structurally identical to the bench one.
gs = 9.0 + float(os.environ.get("PERTURB_GS", 0))
cfg.update({"max_frames": 16, "resolution": [448, 256], "scale": 8,
            "guide_scale": gs, "ddim_timesteps": 50, "decoder_bs": 8})
cfg.UNet = dict(cfg.UNet, type="UNetSD_T2VBase", out_dim=4)
model = MODEL.build(dict(cfg.UNet), dtype=jnp.bfloat16)
autoencoder = AUTO_ENCODER.build(dict(cfg.auto_encoder), dtype=jnp.bfloat16)
diffusion = DIFFUSION.build(dict(cfg.Diffusion))

key = jax.random.PRNGKey(0)
lat_h, lat_w = 32, 56
x0 = jnp.zeros((1, 2, lat_h, lat_w, 4))
t0 = jnp.zeros((1,), jnp.int32)
y0 = jnp.zeros((1, 77, 1024))
unet_params = jax.jit(lambda: model.init(key, x0, t0, y=y0))()
autoencoder.init_random(jax.random.PRNGKey(1), image_size=64)

generate = make_generate_fn(cfg, model, autoencoder, diffusion)
y = jnp.zeros((1, 77, 1024), jnp.float32)
args = (unet_params, autoencoder.params, y, y,
        jnp.asarray([16], jnp.int32), jax.random.PRNGKey(2))

t0_ = time.time()
lowered = generate.lower(*args)
t_lower = time.time() - t0_
t0_ = time.time()
compiled = lowered.compile()
t_compile = time.time() - t0_
sz = sum(os.path.getsize(os.path.join(cache, f)) for f in os.listdir(cache))
print(f"# fused={mode}: lower {t_lower:.1f}s  compile {t_compile:.1f}s  "
      f"cache {sz/1e6:.0f} MB", flush=True)
