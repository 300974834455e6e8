"""t2v_instructvideo_entrance — reward fine-tuning with LoRA.

TPU-native re-implementation of the reference trainer
(reference: tools/train/train_t2v_instructvideo_entrance.py:255-399):
VAE-encode videos, CLIP text, q_sample to a FIXED partial DDIM step
(:319, :358-360), run the differentiable partial DDIM chain with
per-step remat and truncated backprop (:362-372), score the denoised
latents with the HPSv2 segmental reward (:374-378), and backprop through
the sampler into the LoRA parameters ONLY.

The whole thing — partial scan, decode, CLIP reward, grads, update — is
one jitted, donated train step.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import (DATASETS, DIFFUSION, ENGINE, PRETRAIN, VISUAL,
                    default_cfg, merge_update, setup_logging, setup_seed)
from ..data.datasets import SyntheticVideoDataset, batch_iterator
from ..models.reward import (DDPORewardModel, DiffRewardModel,
                             RWRRewardModel)
from ..models import blocks
from ..parallel.mesh import batch_sharding, create_mesh, shard_params
from ..utils.optim import annealing_lr, build_optimizer, freeze_mask

logger = logging.getLogger(__name__)


@ENGINE.register_function("t2v_instructvideo_entrance")
@ENGINE.register_function("train_t2v_instructvideo_entrance")
def train_t2v_instructvideo_entrance(cfg_update, **kwargs):
    cfg = merge_update(default_cfg(), cfg_update)
    log_dir = str(cfg.log_dir)
    os.makedirs(log_dir, exist_ok=True)
    setup_logging(log_dir, rank=jax.process_index())
    key = setup_seed(int(cfg.seed), prng_impl=cfg.get("prng_impl"))
    blocks.set_fused_tt("off")  # one numeric path for all models in training
    mesh = create_mesh()

    from .train_t2v import _build_models, make_prepare_fn, save_checkpoint
    clip_encoder, autoencoder, model, unet_params, diffusion = _build_models(
        cfg, key, frames_example=2)
    assert hasattr(diffusion, "ddim_sample_loop_partial"), \
        "InstructVideo needs Diffusion type DiffusionDDIMReward"

    # LoRA-only training (reference freeze_all_except_lora :190-191)
    pre = dict(cfg.Pretrain)
    pre.setdefault("type", "pretrain_instructvideo")
    pre_fn = PRETRAIN.build(pre.pop("type"))
    unet_params, grad_scale_fn, trainable_fn, resume_step = pre_fn(
        unet_params, **pre)

    import optax
    from ..utils.optim import scale_grads_by_mask
    schedule = annealing_lr(float(cfg.lr), int(cfg.warmup_steps),
                            int(cfg.num_steps), str(cfg.decay_mode))
    opt = optax.chain(scale_grads_by_mask(grad_scale_fn),
                      build_optimizer(schedule,
                                      weight_decay=float(cfg.weight_decay),
                                      betas=tuple(cfg.betas),
                                      eps=float(cfg.eps)))
    mask = freeze_mask(unet_params, trainable_fn)
    n_train = sum(int(np.prod(l.shape))
                  for l, m in zip(jax.tree.leaves(unet_params),
                                  jax.tree.leaves(mask)) if m)
    n_total = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(unet_params))
    logger.info("total %.2fM params, trainable (LoRA) %.2fM",
                n_total / 1e6, n_train / 1e6)
    optimizer = optax.masked(opt, mask)

    unet_params = shard_params(unet_params, mesh)
    state = {"params": unet_params, "opt_state": optimizer.init(unet_params),
             "step": jnp.asarray(resume_step, jnp.int32)}

    # reward family dispatch: the reference only ever wires HPSv2/
    # DiffRewardModel (train_t2v_instructvideo_entrance.py:233-242,
    # "haven't been implemented yet" otherwise); RWR and DDPO are real
    # runnable paths here
    reward_kind = str(cfg.get("reward_mode", "score")).upper()
    reward_cls = {"SCORE": DiffRewardModel, "RWR": RWRRewardModel,
                  "DDPO": DDPORewardModel}.get(reward_kind, DiffRewardModel)
    reward = reward_cls(cfg, clip_encoder, autoencoder,
                        segments=int(cfg.segments),
                        selection_method=str(cfg.selection_method),
                        exponential_TSN=bool(cfg.exponential_TSN),
                        lambda_TAR=float(cfg.lambda_TAR),
                        reward_weights=dict(cfg.reward_weights),
                        ST_reward_weights=dict(cfg.ST_reward_weights),
                        data_align_method=cfg.data_align_method,
                        data_align_coef=float(cfg.data_align_coef),
                        adv_clip_max=float(cfg.adv_clip_max))

    prepare = make_prepare_fn(cfg, autoencoder, clip_encoder)
    ddim_steps = int(cfg.get("ddim_timesteps", 20))
    starting_partial = float(cfg.get("starting_partial", 0.25))
    trunc = cfg.get("trunc_backprop_timestep")
    trunc = int(trunc) if trunc else 1
    guide_scale = float(cfg.guide_scale)
    use_shared_noise = bool(cfg.get("use_shared_noise", True))
    num_T = diffusion.num_timesteps
    start_t = int(diffusion.ddim_timestep_seq(ddim_steps)[
        -int(ddim_steps * starting_partial)])

    def make_cfg_model_fn(params, y_words, zero_y, kd):
        def model_fn(xt, tt):
            x2 = jnp.concatenate([xt, xt], axis=0)
            tb = jnp.broadcast_to(tt, (xt.shape[0],))  # scan passes scalar t
            t2 = jnp.concatenate([tb, tb])
            ctx = jnp.concatenate(
                [y_words,
                 jnp.broadcast_to(zero_y[:1], y_words.shape)], axis=0)
            out = model.apply(params, x2, t2, y=ctx, rngs={"dropout": kd})
            y_out, u_out = jnp.split(out, 2, axis=0)
            return diffusion.classifier_free_guidance(y_out, u_out,
                                                      guide_scale)
        return model_fn

    def shared_noise(kn, ks, x0):
        """shared/temporal-offset noise (reference :326-346)."""
        b = x0.shape[0]
        if use_shared_noise:
            base = jax.random.normal(kn, (b, 1) + x0.shape[2:], jnp.float32)
            return jnp.broadcast_to(base, x0.shape) \
                + 0.1 * jax.random.normal(ks, x0.shape, jnp.float32)
        return jax.random.normal(kn, x0.shape, jnp.float32)

    def apply_grads(state, grads):
        import optax as _ox
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = _ox.apply_updates(state["params"], updates)
        return dict(state, params=params, opt_state=opt_state,
                    step=state["step"] + 1)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, x0, y_words, tokens, zero_y, key):
        """Reward-through-sampler step (HPSv2 score mode, reference
        :356-378): backprop THROUGH the partial DDIM chain."""
        kn, ks, kr, kd = jax.random.split(key, 4)
        b = x0.shape[0]

        def loss_fn(params):
            model_fn = make_cfg_model_fn(params, y_words, zero_y, kd)
            noise = shared_noise(kn, ks, x0)
            t = jnp.full((b,), start_t, jnp.int32)
            noised = diffusion.q_sample(x0, t, noise)
            denoised = diffusion.ddim_sample_loop_partial(
                ks, noised, model_fn, starting_partial=starting_partial,
                trunc_backprop_timestep=trunc, ddim_timesteps=ddim_steps)
            return reward.reward_scorer(kr, tokens, denoised)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        return apply_grads(state, grads), {"loss": loss}

    @partial(jax.jit, donate_argnums=(0,))
    def train_step_rwr(state, x0, y_words, tokens, zero_y, key):
        """Reward-weighted regression (reference reward.py:330-412): the
        per-sample diffusion loss weighted by no-grad reward scores of
        the one-pass denoised estimate (loss, x0_hat from a SINGLE
        model forward — diffusion_ddim.py:677-762)."""
        kn, kr, kd, kt = jax.random.split(key, 4)
        b = x0.shape[0]

        def loss_fn(params):
            def model_fn(xt, tt):
                tb = jnp.broadcast_to(tt, (xt.shape[0],))
                return model.apply(params, xt, tb, y=y_words,
                                   rngs={"dropout": kd})

            t = jax.random.randint(kt, (b,), 0, num_T)
            loss_recon, x0_hat, _ = diffusion.loss(kn, x0, t, model_fn,
                                                   return_aux=True)
            return reward.reward_scorer(kr, tokens, x0_hat,
                                        loss_recon=loss_recon)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        return apply_grads(state, grads), {"loss": loss}

    ddpo_eta = float(cfg.get("ddpo_eta", 1.0))

    @jax.jit
    def ddpo_rollout(params, x0, y_words, tokens, zero_y, key):
        """Stochastic DDIM rollout with per-step log-probs (no grad),
        exercising ddim_sample_with_logprob (reference
        diffusion_ddim.py:595-674). Returns the trajectory + raw scores."""
        # kroll is NOT consumed by shared_noise — deriving the per-step
        # rollout keys from ks (which shared_noise uses for its offset
        # noise) would correlate the initial noise with step-1 noise
        kn, ks, kroll, kr, kd = jax.random.split(key, 5)
        b = x0.shape[0]
        params = jax.lax.stop_gradient(params)
        model_fn = make_cfg_model_fn(params, y_words, zero_y, kd)

        noise = shared_noise(kn, ks, x0)
        t = jnp.full((b,), start_t, jnp.int32)
        xt0 = diffusion.q_sample(x0, t, noise)

        steps_all = diffusion.ddim_timestep_seq(ddim_steps)
        n_part = int(ddim_steps * starting_partial)
        steps = jnp.asarray(steps_all[-n_part:], jnp.int32)
        keys = jax.random.split(kroll, n_part)

        def body(xt, inp):
            step, k = inp
            tb = jnp.full((b,), step, jnp.int32)
            prev, logp, _ = diffusion.ddim_sample_with_logprob(
                k, xt, tb, model_fn, ddim_timesteps=ddim_steps,
                eta=ddpo_eta)
            return prev, (xt, tb, prev)

        final, traj = jax.lax.scan(body, xt0, (steps, keys))
        scores = reward.rollout_scores(kr, tokens, final)
        return traj, scores

    @partial(jax.jit, donate_argnums=(0,))
    def ddpo_policy_step(state, traj, advantages, y_words, zero_y, key):
        """Re-evaluate step log-probs under the trainable params and
        ascend adv * log_prob (DDPO policy gradient)."""
        kd = key
        adv = jnp.asarray(advantages, jnp.float32)

        def loss_fn(params):
            model_fn = make_cfg_model_fn(params, y_words, zero_y, kd)

            @jax.checkpoint
            def step_logp(carry, inp):
                xt, tb, prev = inp
                _, logp, _ = diffusion.ddim_sample_with_logprob(
                    jax.random.PRNGKey(0), xt, tb, model_fn,
                    ddim_timesteps=ddim_steps, eta=ddpo_eta,
                    prev_sample=prev)
                return carry, logp

            _, logps = jax.lax.scan(step_logp, 0.0, traj)  # [n, b]
            return -(adv[None, :] * logps).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        return apply_grads(state, grads), {"loss": loss}

    max_frames = int(cfg.get("max_frames") or 4)
    ds_cfg = dict(cfg.vid_dataset)
    ds_cfg["max_frames"] = max_frames
    dataset = DATASETS.build(ds_cfg)
    if len(dataset) == 0:
        logger.warning("dataset empty — using SyntheticVideoDataset")
        dataset = SyntheticVideoDataset(resolution=cfg.resolution,
                                        max_frames=max_frames,
                                        vit_resolution=cfg.vit_resolution)
    dp = mesh.shape["data"] * mesh.shape["fsdp"]
    batch_size = max(int(cfg.get("batch_size") or 1) // dp, 1) * dp
    data_iter = batch_iterator(dataset, batch_size, seed=int(cfg.seed))
    _, _, zero_y = clip_encoder(text=[""])
    bsh = batch_sharding(mesh)

    # visual hook (reference train_t2v_instructvideo_entrance.py:247-249,
    # 409-425: samples with the LoRA-merged model — our LoRA deltas live
    # in the training params, so the plain params tree is already merged)
    viz = None
    if cfg.get("visual_train") and cfg.visual_train.get("type") in VISUAL:
        viz = VISUAL.build(dict(cfg.visual_train), cfg=cfg, model=model,
                           diffusion=diffusion, autoencoder=autoencoder)

    num_steps = int(cfg.num_steps)
    step = resume_step
    t_last = time.time()
    while step < num_steps:
        batch = next(data_iter)
        tokens = jax.device_put(clip_encoder.tokenize(batch["captions"]), bsh)
        video = jax.device_put(jnp.asarray(batch["video_data"]), bsh)
        key, k1, k2, k3 = jax.random.split(key, 4)
        x0, y_words = prepare(autoencoder.params, clip_encoder.params, video,
                              tokens, k1)
        if reward_kind == "RWR":
            state, metrics = train_step_rwr(state, x0, y_words, tokens,
                                            zero_y, k2)
        elif reward_kind == "DDPO":
            traj, scores = ddpo_rollout(state["params"], x0, y_words,
                                        tokens, zero_y, k2)
            adv = reward.advantages(batch["captions"], np.asarray(scores))
            state, metrics = ddpo_policy_step(state, traj, adv, y_words,
                                              zero_y, k3)
        else:
            state, metrics = train_step(state, x0, y_words, tokens,
                                        zero_y, k2)
        step = int(state["step"])
        if step % int(cfg.log_interval) == 0:
            dt = (time.time() - t_last) / int(cfg.log_interval)
            t_last = time.time()
            logger.info("instructvideo step %d/%d reward-loss %.5f %.2fs/it",
                        step, num_steps, float(metrics["loss"]), dt)
        if viz is not None and step % int(cfg.viz_interval) == 0:
            try:
                viz.run(state["params"], zero_y=zero_y, y_words=y_words,
                        step=step, captions=batch["captions"])
            except Exception as e:  # noqa: BLE001
                if cfg.get("strict_hooks"):
                    raise
                logger.warning("visual hook failed: %s", e)
        if step % int(cfg.save_ckp_interval) == 0 and jax.process_index() == 0:
            save_checkpoint(log_dir, state, use_ema=False)

    logger.info("Congratulations! The training is completed!")
    return state


from ..core import INFER_ENGINE


@INFER_ENGINE.register_function()
def inference_instructvideo_entrance(cfg_update, **kwargs):
    """LoRA UNet eval with DDIM 20/50 (reference
    tools/inferences/inference_instructvideo_entrance.py): the t2v
    pipeline with the LoRA model + merged LoRA checkpoint.

    Honors the reference eval-config surface (configs/instructvideo/
    eval/*.yaml): infer_checkpoint (:157), the webvid caption-file
    triple webvid_dir/webvid_cap_file/webvid_eval_text (:182), the
    webvid_test_caps prompt cap (:196), and webvid_dir_save +
    str(test_caps) as the output dir (:103-104)."""
    import os as _os

    cfg_update = dict(cfg_update or {})
    if cfg_update.get("infer_checkpoint") and \
            not cfg_update.get("test_model"):
        cfg_update["test_model"] = cfg_update["infer_checkpoint"]
    if cfg_update.get("webvid_eval_text") and \
            not cfg_update.get("test_list_path"):
        cfg_update["test_list_path"] = _os.path.join(
            str(cfg_update.get("webvid_dir", "")),
            str(cfg_update.get("webvid_cap_file", "")),
            f'{cfg_update["webvid_eval_text"]}.txt')
    if cfg_update.get("webvid_test_caps"):
        cfg_update.setdefault("test_caps", cfg_update["webvid_test_caps"])
    if cfg_update.get("webvid_dir_save") and not cfg_update.get("log_dir"):
        cfg_update["log_dir"] = (str(cfg_update["webvid_dir_save"])
                                 + str(cfg_update.get("webvid_test_caps",
                                                      "")))
    from .infer_t2v import inference_text2video_entrance
    return inference_text2video_entrance(cfg_update, **kwargs)
