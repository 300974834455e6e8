"""train_dreamvideo_entrance — DreamVideo subject/motion customization.

TPU-native re-implementation of the reference trainer
(reference: tools/train/train_dreamvideo_entrance.py:36-374). Two
customization stages share this engine:

  * identity (textual inversion + spatial adapters): EmbeddingManager
    params + adapter params trainable, backbone frozen (reference
    :166-193); image-condition dropout ``p_image_zero`` (:261-263);
    optional masked diffusion via subject masks (:277-285).
  * motion (temporal adapters): adapter-only training with the CLIP
    appearance condition.

Trainable selection is the pretrain_dreamvideo policy as an optax mask;
the textual-inversion embedding rows join the optimized pytree as a
second top-level branch, so one fused train step updates both.
Checkpoints save ONLY the trained parts (adapters + embeddings), like the
reference's partial state dicts (:339-364).
"""

from __future__ import annotations

import logging
import os
import os.path as osp
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import (AUTO_ENCODER, DATASETS, DIFFUSION, EMBEDDER,
                    EMBEDMANAGER, ENGINE, MODEL, PRETRAIN, VISUAL,
                    default_cfg, merge_update, setup_logging, setup_seed)
from ..data.datasets import SyntheticVideoDataset, batch_iterator
from ..models import blocks
from ..parallel.mesh import batch_sharding, create_mesh, shard_params
from ..utils.optim import annealing_lr, build_optimizer, freeze_mask

logger = logging.getLogger(__name__)


@ENGINE.register_function()
def train_dreamvideo_entrance(cfg_update, **kwargs):
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

    # custom text embedder + embedding manager (reference :166-177)
    custom_embedder = EMBEDDER.build(dict(
        cfg.get("custom_embedder",
                {"type": "FrozenOpenCLIPCustomEmbedder",
                 "arch": cfg.embedder.get("arch", "ViT-H-14"),
                 "layer": "penultimate",
                 "pretrained": cfg.embedder.get("pretrained")})))
    custom_embedder.load_params(clip_encoder.params)

    # reference spells the key 'embedmanager' in the shipped subject
    # yamls (configs/dreamvideo/subjectLearning/*_step1.yaml) — honor
    # both spellings
    em_cfg = dict(cfg.get("embedding_manager")
                  or cfg.get("embedmanager")
                  or {"type": "EmbeddingManager",
                      "placeholder_strings": ["*"],
                      "num_vectors_per_token": 1,
                      "token_dim": cfg.UNet["context_dim"]})
    manager = EMBEDMANAGER.build(em_cfg, embedder=custom_embedder)
    # step2 resumes the step-1 embedding via 'text_embedding_path' (may
    # contain a glob, reference subjectLearning/*_step2.yaml)
    emb_ckpt = cfg.get("embedding_ckpt")
    if not emb_ckpt and cfg.get("text_embedding_path"):
        import glob as _glob
        matches = sorted(_glob.glob(str(cfg.text_embedding_path)))
        emb_ckpt = matches[-1] if matches else None
    if emb_ckpt and os.path.exists(str(emb_ckpt)):
        manager.load(str(emb_ckpt))

    # pretrain policy: adapters trainable, rest frozen (reference :184-193)
    pre = dict(cfg.Pretrain)
    pre.setdefault("type", "pretrain_dreamvideo")
    pre_fn = PRETRAIN.build(pre.pop("type"))
    unet_params, _, trainable_fn, resume_step = pre_fn(unet_params, **pre)

    import optax
    schedule = annealing_lr(float(cfg.lr), int(cfg.warmup_steps),
                            int(cfg.num_steps), str(cfg.decay_mode))
    opt = build_optimizer(schedule, weight_decay=float(cfg.weight_decay),
                          betas=tuple(cfg.betas), eps=float(cfg.eps))
    train_params = {"unet": unet_params, "ti": manager.params}
    mask = {"unet": freeze_mask(unet_params, trainable_fn),
            "ti": jax.tree.map(lambda _: True, manager.params)}
    optimizer = optax.masked(opt, mask)

    train_params["unet"] = shard_params(train_params["unet"], mesh)
    state = {"params": train_params,
             "opt_state": optimizer.init(train_params),
             "step": jnp.asarray(resume_step, jnp.int32)}

    prepare = make_prepare_fn(cfg, autoencoder, clip_encoder)
    p_zero = float(cfg.p_zero)
    p_image_zero = float(cfg.get("p_image_zero", 0.1))
    lam = float(cfg.get("adapter_condition_lam", 1.0))
    num_T = diffusion.num_timesteps
    use_mask = bool(cfg.get("use_mask_diffusion", False))
    clip_layer_idx = custom_embedder.layer_idx

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, x0, tokens, zero_y, adapter_cond, loss_mask, key):
        kt, kn, kz, kd, ki = jax.random.split(key, 5)
        b = x0.shape[0]

        def loss_fn(params):
            # textual-inversion hook: manager params inject into the text
            # tower input (differentiable; reference :221-232)
            tok_emb = custom_embedder.module.apply(
                custom_embedder.params, tokens, method="embed_tokens")
            tok_emb = manager.apply(params["ti"], tokens, tok_emb)
            y_words = custom_embedder.module.apply(
                custom_embedder.params, tok_emb, tokens, clip_layer_idx,
                method="encode_text_hidden_override")

            drop = jax.random.uniform(kz, (b, 1, 1)) < p_zero
            y = jnp.where(drop, zero_y.astype(y_words.dtype), y_words)
            # image-condition dropout (reference :261-263)
            img_drop = jax.random.uniform(ki, (b, 1)) < p_image_zero
            acond = jnp.where(img_drop, 0.0, adapter_cond)

            t = jax.random.randint(kt, (b,), 0, num_T)

            def model_fn(xt, tt):
                return model.apply(params["unet"], xt, tt, y=y,
                                   adapter_condition=acond,
                                   adapter_condition_lam=lam,
                                   rngs={"dropout": kd})

            loss = diffusion.loss(kn, x0, t, model_fn,
                                  loss_mask=loss_mask if use_mask else None)
            return loss.mean()

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        return dict(state, params=params, opt_state=opt_state,
                    step=state["step"] + 1), {"loss": loss}

    # data (VideoCustomDataset / ImageCustomDataset per stage)
    max_frames = int(cfg.get("max_frames") or 4)
    # subject step1 names its image dataset 'img_dataset' (reference
    # configs/dreamvideo/subjectLearning/*_step1.yaml)
    ds_cfg = dict(cfg.get("vid_dataset") or cfg.img_dataset)
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

    # visual hook (reference train_dreamvideo_entrance.py:214-216,315-335)
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
        # subject CLIP feature as the adapter condition (reference :247-255)
        vit = jnp.asarray(batch["vit_frame"])
        adapter_cond = clip_encoder.module.apply(
            clip_encoder.params, vit, method="encode_image")
        # subject mask from the dataset (ImageCustomDataset) when present —
        # the reference's masked diffusion restricts the loss to subject
        # pixels (train_dreamvideo_entrance.py:237,277-285)
        if "mask" in batch:
            loss_mask = jnp.asarray(batch["mask"], jnp.float32)
        else:
            loss_mask = jnp.ones(video.shape[:1] + video.shape[1:4] + (1,))

        key, k1, k2 = jax.random.split(key, 3)
        x0, _ = prepare(autoencoder.params, clip_encoder.params, video,
                        tokens, k1)
        lm = jax.image.resize(loss_mask, x0.shape[:4] + (1,), "nearest")
        state, metrics = train_step(state, x0, tokens, zero_y, adapter_cond,
                                    lm, k2)
        step = int(state["step"])
        if step % int(cfg.log_interval) == 0:
            dt = (time.time() - t_last) / int(cfg.log_interval)
            t_last = time.time()
            logger.info("dreamvideo step %d/%d loss %.4f %.2fs/it", step,
                        num_steps, float(metrics["loss"]), dt)
        if viz is not None and step % int(cfg.viz_interval) == 0:
            try:
                # conditioning with the learned '*' token active: TI rows
                # injected into the text tower (reference :315-335)
                tok_emb = custom_embedder.module.apply(
                    custom_embedder.params, tokens, method="embed_tokens")
                tok_emb = manager.apply(state["params"]["ti"], tokens,
                                        tok_emb)
                y_words = custom_embedder.module.apply(
                    custom_embedder.params, tok_emb, tokens, clip_layer_idx,
                    method="encode_text_hidden_override")
                viz.run(state["params"]["unet"], zero_y=zero_y,
                        y_words=y_words, step=step,
                        captions=batch["captions"],
                        adapter_condition=adapter_cond)
            except Exception as e:  # noqa: BLE001
                if cfg.get("strict_hooks"):
                    raise
                logger.warning("visual hook failed: %s", e)
        if step % int(cfg.save_ckp_interval) == 0 and jax.process_index() == 0:
            # save ONLY the customization: embeddings + trainable subtree
            # (reference partial state dicts :339-364)
            manager.params = state["params"]["ti"]
            manager.save(osp.join(log_dir, f"embeddings_step_{step}"))
            adapters = _extract_trainable(state["params"]["unet"],
                                          mask["unet"])
            save_checkpoint(log_dir, {"params": adapters,
                                      "step": state["step"]}, use_ema=False)

    logger.info("Congratulations! The training is completed!")
    return state


def _extract_trainable(params, mask):
    """Zero out frozen leaves so the saved tree carries only adapters."""
    return jax.tree.map(lambda p, m: p if m else jnp.zeros((), p.dtype),
                        params, mask)
