"""Remat-policy sweep for the fused train step (16f 448x256, bf16,
adafactor): None (full block recompute) vs dots vs dots_no_batch, at
the largest batch that fits. Prints s/it + peak-memory proxy."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), "workspace", "jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# PROF_RNG=rbg: hardware-RNG keys for dropout masks (threefry mask
# generation is pure VPU elementwise work, replayed again under remat)
if os.environ.get("PROF_RNG"):
    jax.config.update("jax_default_prng_impl", os.environ["PROF_RNG"])

import vgen_tpu  # noqa: F401
from vgen_tpu.core import DIFFUSION, MODEL
from vgen_tpu.core.config import AttrDict
from vgen_tpu.engines.train_t2v import make_train_step
from vgen_tpu.utils.optim import adafactor, annealing_lr

F, LH, LW = 16, 32, 56
N = 5
B = int(os.environ.get("PROF_B", 2))

ucfg = dict(type="UNetSD_T2VBase", in_dim=4, dim=320, y_dim=1024,
            context_dim=1024, out_dim=4, dim_mult=[1, 2, 4, 4],
            num_heads=8, head_dim=64, num_res_blocks=2,
            attn_scales=[1.0, 0.5, 0.25],
            # PROF_DROPOUT=0 bounds the cost of mask generation (threefry
            # elementwise, replayed under remat) + the mask multiplies
            dropout=float(os.environ.get("PROF_DROPOUT", 0.1)),
            temporal_attention=True,
            use_checkpoint=os.environ.get("PROF_CKPT", "1") == "1",
            training=True, dtype=jnp.bfloat16)
dcfg = {"type": "DiffusionDDIM", "schedule": "linear_sd",
        "schedule_param": {"num_timesteps": 1000, "init_beta": 0.00085,
                           "last_beta": 0.0120, "zero_terminal_snr": False},
        "mean_type": "eps", "loss_type": "mse", "var_type": "fixed_small",
        "noise_strength": 0.0}

POLICIES = [None if p == "none" else p for p in
            os.environ.get("PROF_POLICIES", "none,attn").split(",")]
# per-level remat skip (unet remat_skip_scale): "policy@skip" entries,
# e.g. PROF_POLICIES="attn_gn@0.25,attn_gn@0.5"
SKIP = float(os.environ.get("PROF_SKIP", 0.0))

for policy in POLICIES:
    skip = SKIP
    if policy and "@" in policy:
        policy, skip = policy.split("@")
        skip = float(skip)
        policy = policy or None
    try:
        model = MODEL.build(dict(ucfg, remat_policy=policy,
                                 remat_skip_scale=skip))
        diffusion = DIFFUSION.build(dict(dcfg))
        x0s = jnp.zeros((1, 2, LH, LW, 4))
        params = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(0)},
            x0s, jnp.zeros((1,), jnp.int32),
            y=jnp.zeros((1, 77, 1024))))()
        optimizer = adafactor(annealing_lr(1e-5, 10, 1000, "cosine"))
        cfg = AttrDict(p_zero=0.1, use_div_loss=False, ema_decay=0.9999)
        state = {"params": params, "opt_state": optimizer.init(params),
                 "step": jnp.asarray(0, jnp.int32)}
        step = make_train_step(cfg, model, diffusion, optimizer,
                               use_ema=False)
        x = jnp.asarray(np.random.RandomState(0).randn(B, F, LH, LW, 4),
                        jnp.float32)
        y = jnp.asarray(np.random.RandomState(1).randn(B, 77, 1024),
                        jnp.float32)
        zero_y = jnp.zeros((1, 77, 1024), jnp.float32)
        t0 = time.time()
        comp = step.lower(state, x, y, zero_y, jax.random.PRNGKey(1)).compile()
        ct = time.time() - t0
        ma = comp.memory_analysis()
        flops = float(comp.cost_analysis().get("flops", float("nan"))) \
            if not isinstance(comp.cost_analysis(), list) else \
            float(comp.cost_analysis()[0].get("flops", float("nan")))
        state, m = comp(state, x, y, zero_y, jax.random.PRNGKey(2))
        np.asarray(m["loss"])
        t0 = time.time()
        for i in range(N):
            state, m = comp(state, x, y, zero_y, jax.random.PRNGKey(3 + i))
        np.asarray(m["loss"])
        dt = (time.time() - t0) / N
        print(f"policy={str(policy):10s}@skip{skip} b{B}: {dt*1e3:8.1f} ms/it  "
              f"{flops/dt/1e12:6.1f} TF/s  temp {ma.temp_size_in_bytes/1e9:.2f} GB  "
              f"(compile {ct:.0f}s)", flush=True)
        del state, comp, params, model
        import gc; gc.collect()
    except Exception as e:
        print(f"policy={policy}: FAILED {type(e).__name__}: {e}", flush=True)
