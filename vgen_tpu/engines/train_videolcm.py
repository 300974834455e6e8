"""train_videolcm_t2v_entrance — VideoLCM consistency distillation.

TPU-native re-implementation of the reference trainer
(reference: tools/train/train_videolcm_t2v_entrance.py:300-756). Three
parameter sets over ONE UNet function — student, frozen teacher, EMA
target (reference builds 3 modules :335-356) — with the LCM algorithm:

  sample DDIM index -> noise to start_timestep -> student consistency
  prediction (boundary-scaled, fixed w=9 guidance embedding :544-554) ->
  teacher CFG x0/eps -> DDIMSolver step to x_prev (:575-622) -> target
  net consistency prediction at t_prev (:642-660) -> huber loss
  (:666-671) -> AdamW on student; target <- EMA(target, student, 0.95)
  (:701).

All of it is one jitted, donated train step.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import (AUTO_ENCODER, DATASETS, DIFFUSION, EMBEDDER, ENGINE,
                    MODEL, default_cfg, merge_update, setup_logging,
                    setup_seed)
from ..data.datasets import SyntheticVideoDataset, batch_iterator
from ..diffusion.lcm import (DDIMSolver, guidance_scale_embedding,
                             predicted_origin, scalings_for_boundary_conditions,
                             append_dims)
from ..models import blocks
from ..parallel.mesh import batch_sharding, create_mesh, shard_params
from ..utils.optim import annealing_lr, build_optimizer

logger = logging.getLogger(__name__)


def make_lcm_train_step(cfg, model, diffusion, solver, optimizer):
    """One fused consistency-distillation step."""
    import dataclasses
    # teacher/target run in eval mode (no dropout rng needed)
    model_eval = dataclasses.replace(model, training=False) \
        if getattr(model, "training", False) else model
    num_T = diffusion.num_timesteps
    ddim_steps = int(cfg.get("ddim_timesteps", 50))
    topk = num_T // ddim_steps
    alphas = jnp.sqrt(diffusion.alphas_cumprod)
    sigmas = jnp.sqrt(1.0 - diffusion.alphas_cumprod)
    w_fixed = float(cfg.get("set_fixed_guidance") or 9.0)
    ema_decay = float(cfg.get("target_ema_decay", 0.95))
    huber_c = 0.001
    guidance_dim = int(cfg.UNet.get("dim", 320))

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, x0, y_words, zero_y, key):
        kidx, knoise, kd = jax.random.split(key, 3)
        b = x0.shape[0]
        index = jax.random.randint(kidx, (b,), 0, ddim_steps)
        start_t = solver.ddim_timesteps[index]
        t_prev = jnp.maximum(start_t - topk, 0)

        c_skip_s, c_out_s = scalings_for_boundary_conditions(
            start_t.astype(jnp.float32))
        c_skip, c_out = scalings_for_boundary_conditions(
            t_prev.astype(jnp.float32))
        nd = x0.ndim
        c_skip_s, c_out_s, c_skip, c_out = (
            append_dims(v, nd) for v in (c_skip_s, c_out_s, c_skip, c_out))

        noise = jax.random.normal(knoise, x0.shape, jnp.float32)
        noisy = diffusion.q_sample(x0, start_t, noise)

        w = jnp.full((b,), w_fixed, jnp.float32)
        w_emb = guidance_scale_embedding(w, embedding_dim=guidance_dim)
        w_b = w.reshape((b,) + (1,) * (nd - 1))

        zero_ctx = jnp.broadcast_to(zero_y[:1], y_words.shape)

        def loss_fn(student_params):
            # student consistency prediction (reference :556-572)
            pred = model.apply(student_params, noisy, start_t, y=y_words,
                               t_w=w_emb, rngs={"dropout": kd})
            px0 = predicted_origin(pred, start_t, noisy, "v_prediction",
                                   alphas, sigmas)
            model_pred = c_skip_s * noisy + c_out_s * px0

            # teacher CFG -> x_prev (reference :575-622), frozen
            cond = model_eval.apply(state["teacher"], noisy, start_t, y=y_words)
            ucond = model_eval.apply(state["teacher"], noisy, start_t, y=zero_ctx)
            cond_x0 = predicted_origin(cond, start_t, noisy, "v_prediction",
                                       alphas, sigmas)
            ucond_x0 = predicted_origin(ucond, start_t, noisy, "v_prediction",
                                        alphas, sigmas)
            pred_x0 = cond_x0 + w_b * (cond_x0 - ucond_x0)
            pred_noise = cond + w_b * (cond - ucond)
            # v -> eps at start_t (reference :615-620)
            a_s = append_dims(alphas[start_t], nd)
            s_s = append_dims(sigmas[start_t], nd)
            pred_noise = a_s * pred_noise + s_s * noisy
            x_prev = solver.ddim_step(pred_x0, pred_noise, index)
            x_prev = jax.lax.stop_gradient(x_prev)

            # target net prediction at t_prev (reference :642-660)
            tgt = model_eval.apply(state["target"], x_prev, t_prev, y=y_words)
            tgt_x0 = predicted_origin(tgt, t_prev, x_prev, "v_prediction",
                                      alphas, sigmas)
            target = jax.lax.stop_gradient(c_skip * x_prev + c_out * tgt_x0)

            # huber loss (reference :666-671)
            return jnp.mean(jnp.sqrt((model_pred - target) ** 2 + huber_c ** 2)
                            - huber_c)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        import optax
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        target = jax.tree.map(lambda t_, s_: t_ * ema_decay
                              + s_ * (1.0 - ema_decay),
                              state["target"], params)
        new_state = dict(state, params=params, opt_state=opt_state,
                         target=target, step=state["step"] + 1)
        return new_state, {"loss": loss}

    return train_step


@ENGINE.register_function()
def train_videolcm_t2v_entrance(cfg_update, **kwargs):
    cfg = merge_update(default_cfg(), cfg_update)

    log_dir = str(cfg.log_dir)
    os.makedirs(log_dir, exist_ok=True)
    setup_logging(log_dir, rank=jax.process_index())
    key = setup_seed(int(cfg.seed), prng_impl=cfg.get("prng_impl"))
    # student / frozen teacher / EMA target must share one numeric path:
    # the consistency Huber loss (huber_c 1e-3) compares their outputs
    blocks.set_fused_tt("off")
    mesh = create_mesh(fsdp=int(cfg.get("fsdp_size", 1))
                       if cfg.get("use_fsdp") else 1)

    from .train_t2v import _build_models, make_prepare_fn
    max_frames = int(cfg.get("max_frames") or 4)
    clip_encoder, autoencoder, model, params, diffusion = _build_models(
        cfg, key, frames_example=2)
    # teacher initialized from the pretrained base (reference loads the
    # base ckpt into both teacher and student, :335-356)
    pre = dict(cfg.Pretrain)
    resume = pre.get("resume_checkpoint")
    if resume and os.path.exists(resume):
        from ..utils.ckpt import load_unet_params
        params = load_unet_params(resume, params, strict=False)

    solver = DDIMSolver(np.asarray(diffusion.alphas_cumprod),
                        timesteps=diffusion.num_timesteps,
                        ddim_timesteps=int(cfg.get("ddim_timesteps", 50)))

    import optax
    schedule = annealing_lr(float(cfg.lr), int(cfg.warmup_steps),
                            int(cfg.num_steps), str(cfg.decay_mode))
    optimizer = build_optimizer(schedule, weight_decay=float(cfg.weight_decay),
                                betas=tuple(cfg.betas), eps=float(cfg.eps))

    params = shard_params(params, mesh)
    state = {
        "params": params,
        "teacher": jax.tree.map(jnp.copy, params),
        "target": jax.tree.map(jnp.copy, params),
        "opt_state": optimizer.init(params),
        "step": jnp.asarray(0, jnp.int32),
    }
    train_step = make_lcm_train_step(cfg, model, diffusion, solver, optimizer)
    prepare = make_prepare_fn(cfg, autoencoder, clip_encoder)

    ds_cfg = dict(cfg.vid_dataset)
    ds_cfg["max_frames"] = max_frames
    dataset = DATASETS.build(ds_cfg)
    if len(dataset) == 0:
        logger.warning("vid_dataset empty — using SyntheticVideoDataset")
        dataset = SyntheticVideoDataset(resolution=cfg.resolution,
                                        max_frames=max_frames,
                                        vit_resolution=cfg.vit_resolution)
    dp = mesh.shape["data"] * mesh.shape["fsdp"]
    batch_size = max(int(cfg.get("batch_size") or 2) // dp, 1) * dp
    data_iter = batch_iterator(dataset, batch_size, seed=int(cfg.seed))
    _, _, zero_y = clip_encoder(text=[""])
    bsh = batch_sharding(mesh)

    num_steps = int(cfg.num_steps)
    step = 0
    t_last = time.time()
    while step < num_steps:
        batch = next(data_iter)
        tokens = jax.device_put(clip_encoder.tokenize(batch["captions"]), bsh)
        video = jax.device_put(jnp.asarray(batch["video_data"]), bsh)
        key, k1, k2 = jax.random.split(key, 3)
        x0, y_words = prepare(autoencoder.params, clip_encoder.params,
                              video, tokens, k1)
        state, metrics = train_step(state, x0, y_words, zero_y, k2)
        step = int(state["step"])
        if step % int(cfg.log_interval) == 0:
            dt = (time.time() - t_last) / int(cfg.log_interval)
            t_last = time.time()
            logger.info("lcm step %d/%d loss %.5f %.2fs/it", step, num_steps,
                        float(metrics["loss"]), dt)
        if step % int(cfg.save_ckp_interval) == 0 and jax.process_index() == 0:
            from .train_t2v import save_checkpoint
            save_checkpoint(log_dir, {"params": state["params"],
                                      "ema": state["target"],
                                      "step": state["step"]}, use_ema=True)

    logger.info("Congratulations! The training is completed!")
    return state
