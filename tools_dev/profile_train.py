"""Full-size training-step benchmark on the TPU (1.4B UNet, bf16).

Measures the fused train step (q_sample + UNet fwd/bwd + AdamW + EMA)
at the reference's 16-frame 448x256 workload, batch 1.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

import vgen_tpu  # noqa: F401
from vgen_tpu.core import DIFFUSION, MODEL
from vgen_tpu.core.config import AttrDict
from vgen_tpu.engines.train_t2v import make_train_step
from vgen_tpu.utils.optim import annealing_lr, build_optimizer

B, F, LH, LW = 1, 16, 32, 56
N = 10


def main():
    ucfg = dict(type="UNetSD_T2VBase", in_dim=4, dim=320, y_dim=1024,
                context_dim=1024, out_dim=4, dim_mult=[1, 2, 4, 4],
                num_heads=8, head_dim=64, num_res_blocks=2,
                attn_scales=[1.0, 0.5, 0.25], dropout=0.1,
                temporal_attention=True, use_checkpoint=True,
                training=True, dtype=jnp.bfloat16)
    model = MODEL.build(ucfg)
    diffusion = DIFFUSION.build({
        "type": "DiffusionDDIM", "schedule": "linear_sd",
        "schedule_param": {"num_timesteps": 1000, "init_beta": 0.00085,
                           "last_beta": 0.0120, "zero_terminal_snr": False},
        "mean_type": "eps", "loss_type": "mse", "var_type": "fixed_small",
        "noise_strength": 0.0})

    x0 = jnp.zeros((B, F, LH, LW, 4), jnp.float32)
    t0 = jnp.zeros((B,), jnp.int32)
    y0 = jnp.zeros((B, 77, 1024), jnp.float32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x0, t0,
                                        y=y0))()
    nparams = sum(x.size for x in jax.tree.leaves(params))
    print(f"# params: {nparams/1e9:.3f} B")

    # single-chip 1.4B: AdamW f32 moments + EMA (~22 GB) exceed one
    # v5e's HBM — use adafactor, no EMA (multi-chip FSDP carries the
    # full AdamW+EMA config; see dryrun_multichip)
    from vgen_tpu.utils.optim import adafactor
    optimizer = adafactor(annealing_lr(1e-5, 10, 1000, "cosine"))
    cfg = AttrDict(p_zero=0.1, use_div_loss=False, ema_decay=0.9999)
    state = {"params": params, "opt_state": optimizer.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    train_step = make_train_step(cfg, model, diffusion, optimizer,
                                 use_ema=False)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, F, LH, LW, 4), jnp.float32)
    y = jnp.asarray(rng.randn(B, 77, 1024), jnp.float32)
    zero_y = jnp.zeros((1, 77, 1024), jnp.float32)

    t0c = time.time()
    state, metrics = train_step(state, x, y, zero_y, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics["loss"])
    print(f"# compile+1st step: {time.time()-t0c:.1f}s "
          f"loss={float(metrics['loss']):.4f}")

    t0t = time.time()
    for i in range(N):
        state, metrics = train_step(state, x, y, zero_y,
                                    jax.random.PRNGKey(2 + i))
    jax.block_until_ready(metrics["loss"])
    dt = (time.time() - t0t) / N
    # fwd ~17 TFLOP (profile_unet, b2 incl CFG -> b1 ~8.5); bwd ~2x fwd
    flops = 8.5e12 * 3
    print(f"train step: {dt*1e3:.1f} ms/step  ({flops/dt/1e12:.1f} TF/s, "
          f"{1.0/dt:.2f} steps/s, batch {B}x{F}f)")


if __name__ == "__main__":
    main()
