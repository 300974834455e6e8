"""train_t2v_entrance — ModelScope-T2V / TF-T2V base training.

TPU-native re-implementation of the reference trainer
(reference: tools/train/train_t2v_enterance.py:36-318). Same loop — VAE
encode chunks, CLIP text, p_zero caption dropout, diffusion.loss, AdamW +
AnnealingLR, EMA lerp, periodic visualization + checkpoints — with the
engine room redesigned for TPU SPMD:

  * one jitted, donated train_step per (frames, batch) bucket; everything
    (q_sample, UNet fwd/bwd, optimizer, EMA) is one XLA program.
  * parallelism is a Mesh ("data","fsdp","tensor"): batch over data+fsdp,
    ZeRO-3 param sharding over fsdp — replacing DDP/fairscale-FSDP
    (reference :171, :165-169). Gradient mean over data = DDP allreduce,
    inserted by XLA.
  * EMA is a sharded pytree updated in-step — the reference's manual
    key-strided sharded EMA (:157-159, :259-262) for free.
  * bf16 compute, f32 master weights — no GradScaler (:164, :234-253).
  * heterogeneous frame_lens buckets (:100-104) become a deterministic
    bucket rotation — one compiled program per (frames, batch) shape.
  * checkpoints via Orbax (sharding-aware) instead of torch.save.
"""

from __future__ import annotations

import logging
import os
import os.path as osp
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import (AUTO_ENCODER, DATASETS, DIFFUSION, EMBEDDER, ENGINE,
                    MODEL, PRETRAIN, VISUAL, default_cfg, merge_update,
                    setup_logging, setup_seed)
from ..data.datasets import SyntheticVideoDataset, batch_iterator
from ..models import blocks
from ..parallel.mesh import (batch_sharding, create_mesh, param_shardings,
                             replicated, shard_params)
from ..parallel.multihost import global_batch, replicate_to_mesh
from ..utils.optim import (annealing_lr, build_optimizer, ema_update,
                           freeze_mask, scale_grads_by_mask)

logger = logging.getLogger(__name__)


def _build_models(cfg, key, frames_example: int):
    k1, k2, k3 = jax.random.split(key, 3)
    clip_encoder = EMBEDDER.build(dict(cfg.embedder))
    clip_encoder.init_random(k1)
    autoencoder = AUTO_ENCODER.build(dict(cfg.auto_encoder))
    autoencoder.init_random(k2, image_size=64)

    ucfg = dict(cfg.UNet)
    if "TFT2V" in ucfg["type"] or "VideoLCM" in ucfg["type"]:
        ucfg.setdefault("video_compositions",
                        list(cfg.get("video_compositions", ["text"])))
        ucfg.setdefault("resolution", list(cfg.resolution))
        cfg.UNet = ucfg
    model = MODEL.build(ucfg, training=True)
    lat_h = int(cfg.resolution[1]) // 8
    lat_w = int(cfg.resolution[0]) // 8
    x0 = jnp.zeros((1, frames_example, lat_h, lat_w, cfg.UNet["in_dim"]))
    t0 = jnp.zeros((1,), jnp.int32)
    y0 = jnp.zeros((1, 77, cfg.UNet["context_dim"]))
    from .infer_t2v import model_init_kwargs
    init_kwargs = model_init_kwargs(cfg, lat_h, lat_w, frames=frames_example)
    # jit the init (eager is op-by-op: ~minutes through the TPU tunnel)
    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": k}, x0, t0, y=y0, **init_kwargs))(k3)
    diffusion = DIFFUSION.build(dict(cfg.Diffusion))
    return clip_encoder, autoencoder, model, params, diffusion


def make_train_step(cfg, model, diffusion, optimizer, use_ema: bool):
    """One fused train step: dropout-conditioned loss -> grads -> update
    -> EMA. Donated state dict {params, opt_state, ema, step}."""
    p_zero = float(cfg.p_zero)
    num_timesteps = diffusion.num_timesteps
    use_div_loss = bool(cfg.get("use_div_loss", False))

    def loss_fn(params, x0, y_words, zero_y, key):
        kt, kn, kz, kd = jax.random.split(key, 4)
        b = x0.shape[0]
        t = jax.random.randint(kt, (b,), 0, num_timesteps)
        # caption dropout -> empty-prompt embedding (reference :218-224)
        drop = jax.random.uniform(kz, (b, 1, 1)) < p_zero
        y = jnp.where(drop, zero_y.astype(y_words.dtype), y_words)

        def model_fn(xt, tt):
            return model.apply(params, xt, tt, y=y, rngs={"dropout": kd})

        loss = diffusion.loss(kn, x0, t, model_fn, use_div_loss=use_div_loss)
        return loss.mean()

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, x0, y_words, zero_y, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            state["params"], x0, y_words, zero_y, key)
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        import optax
        params = optax.apply_updates(state["params"], updates)
        new_state = dict(state, params=params, opt_state=opt_state,
                         step=state["step"] + 1)
        if use_ema:
            new_state["ema"] = ema_update(state["ema"], params,
                                          float(cfg.ema_decay))
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return train_step


def make_prepare_fn(cfg, autoencoder, clip_encoder):
    """VAE-encode video chunks + CLIP-encode tokens, one jitted program
    (reference chunked encode :205-212, CLIP :218)."""
    scale_factor = float(cfg.scale_factor)
    chunk = int(cfg.chunk_size)
    layer_idx = clip_encoder.layer_idx

    @jax.jit
    def prepare(vae_params, clip_params, video, tokens, key):
        b, f, h, w, c = video.shape
        flat = video.reshape(b * f, h, w, c)
        n = flat.shape[0]
        cs = chunk if n % chunk == 0 else n
        chunks = flat.reshape(n // cs, cs, h, w, c)
        moments = jax.lax.map(
            lambda x: autoencoder.module.apply(vae_params, x,
                                               method="encode_moments"),
            chunks)
        moments = moments.reshape(n, h // 8, w // 8, -1)
        from ..models.autoencoder import DiagonalGaussianDistribution
        z = DiagonalGaussianDistribution(moments).sample(key) * scale_factor
        x0 = z.reshape(b, f, h // 8, w // 8, -1)
        _, y_words = clip_encoder.module.apply(
            clip_params, tokens, layer_idx, method="encode_text_pooled")
        return x0, y_words

    return prepare


def plan_bucket_slots(cfg, dp: int):
    """Rotation slots (frames, batch, fps), one per frame_lens position.

    Duplicates in frame_lens encode the reference's sampling ratio
    (frame_lens [1,16,16,16,16,32,32,32] = 1/8 image, 4/8 16-frame,
    3/8 32-frame ranks) and each position gets its own
    sample_fps[i % len] (reference train_t2v_enterance.py:100-104).
    Identical (frames, batch) shapes share one compiled XLA program, so
    repeated slots cost nothing extra to compile."""
    frame_lens = list(cfg.frame_lens)
    batch_sizes = {str(k): v for k, v in dict(cfg.batch_sizes).items()}
    sample_fps = list(cfg.sample_fps) if cfg.get("sample_fps") else [8]
    if cfg.get("max_frames"):
        f0 = int(cfg.max_frames)
        b0 = int(cfg.get("batch_size") or batch_sizes.get(str(f0), 1))
        # reference picks sample_fps[rank % len] per DDP rank
        # (train_t2v_enterance.py:100-104); the SPMD analog of "rank"
        # for a single fixed-shape slot is the host process index
        rank = jax.process_index()
        slots = [(f0, b0, int(sample_fps[rank % len(sample_fps)]))]
    else:
        slots = [(int(fl), int(batch_sizes.get(str(fl), 1)),
                  int(sample_fps[i % len(sample_fps)]))
                 for i, fl in enumerate(frame_lens)]
    return [(f, max(b // dp, 1) * dp, fps) for f, b, fps in slots]


@ENGINE.register_function()
def train_t2v_entrance(cfg_update, **kwargs):
    cfg = merge_update(default_cfg(), cfg_update)
    return train_worker(cfg)


def train_worker(cfg):
    log_dir = str(cfg.log_dir)
    os.makedirs(log_dir, exist_ok=True)
    rank = jax.process_index()
    setup_logging(log_dir, rank=rank, rank0_only=False)
    key = setup_seed(int(cfg.seed), prng_impl=cfg.get("prng_impl"))
    # one numeric path for every model in a train step (incl. eval-mode
    # teachers and visual-hook sampling) — see blocks.set_fused_tt
    blocks.set_fused_tt("off")

    # ---- mesh: data x fsdp (reference DDP/FSDP, :165-171) ----------------
    fsdp = int(cfg.get("fsdp_size", 1)) if cfg.get("use_fsdp") else 1
    mesh = create_mesh(fsdp=fsdp)
    logger.info("mesh: %s devices=%s", dict(mesh.shape), len(jax.devices()))

    # ---- shapes: frame buckets (reference heterogeneous ranks :100-104).
    # The reference runs DIFFERENT shapes on different DDP ranks at once;
    # under SPMD every device runs the same program, so the bucket list
    # becomes a deterministic rotation — one compiled step per
    # (frames, batch) shape, same steady-state shape mix.
    dp = mesh.shape["data"] * mesh.shape["fsdp"]
    bucket_slots = plan_bucket_slots(cfg, dp)

    clip_encoder, autoencoder, model, params, diffusion = _build_models(
        cfg, key, frames_example=2)

    # ---- pretrain / resume policy (reference :154) ------------------------
    pre = dict(cfg.Pretrain)
    pre_fn = PRETRAIN.build(pre.pop("type"))
    params, grad_scale_fn, trainable_fn, resume_step = pre_fn(params, **pre)

    # ---- optimizer (reference AdamW + AnnealingLR :162-176) ---------------
    import optax
    schedule = annealing_lr(float(cfg.lr), int(cfg.warmup_steps),
                            int(cfg.num_steps), str(cfg.decay_mode))
    # cfg.optimizer: 'adamw' (reference default) or 'adafactor' — the
    # factored second moment is what makes single-chip 1.4B training fit
    # in one v5e's 16 GB HBM (AdamW's f32 moments alone are ~11 GB)
    if str(cfg.get("optimizer", "adamw")).lower() == "adafactor":
        from ..utils.optim import adafactor
        base_opt = adafactor(schedule)
    else:
        base_opt = build_optimizer(schedule,
                                   weight_decay=float(cfg.weight_decay),
                                   betas=tuple(cfg.betas),
                                   eps=float(cfg.eps))
    opt = optax.chain(scale_grads_by_mask(grad_scale_fn), base_opt)
    mask = freeze_mask(params, trainable_fn)
    optimizer = optax.masked(opt, mask)

    use_ema = bool(cfg.use_ema)

    # ---- state on mesh (FSDP shardings) ------------------------------------
    params = shard_params(params, mesh)
    state = {"params": params, "opt_state": optimizer.init(params),
             "step": jnp.asarray(resume_step, jnp.int32)}
    if use_ema:
        state["ema"] = jax.tree.map(jnp.copy, params)

    train_step = make_train_step(cfg, model, diffusion, optimizer, use_ema)
    prepare = make_prepare_fn(cfg, autoencoder, clip_encoder)

    # ---- auto-resume from our own orbax checkpoints (reference resumes
    # via Pretrain torch ckpts; we add native resume on top) --------------
    ck_path, ck_step = latest_checkpoint(log_dir)
    if ck_path and ck_step > resume_step and bool(cfg.get("auto_resume", True)):
        try:
            restored = restore_checkpoint(ck_path, None)

            def _like(cur, new):
                # keep dtype AND sharding of the freshly-built state so an
                # FSDP-sharded resume stays sharded; leave single-device
                # leaves (optax scalars) uncommitted so jit may place them
                arr = jnp.asarray(new, cur.dtype)
                sh = getattr(cur, "sharding", None)
                if sh is not None and not isinstance(
                        sh, jax.sharding.SingleDeviceSharding):
                    arr = jax.device_put(arr, sh)
                return arr

            state["params"] = jax.tree.map(_like, state["params"],
                                           restored["params"])
            if use_ema and "ema" in restored:
                state["ema"] = jax.tree.map(_like, state["ema"],
                                            restored["ema"])
            # optimizer state: restore the saved leaves into the freshly
            # initialized structure so Adam moments and the optax count
            # survive the restart (reference resumes optimizer+scaler,
            # tools/basic_funcs/pretrain_functions.py:145-159)
            if "opt_state" in restored:
                leaves, treedef = jax.tree.flatten(state["opt_state"])
                saved = [restored["opt_state"][f"leaf_{i:04d}"]
                         for i in range(len(leaves))]
                state["opt_state"] = jax.tree.unflatten(
                    treedef, [_like(cur, s)
                              for cur, s in zip(leaves, saved)])
            else:
                logger.warning("checkpoint has no opt_state — optimizer "
                               "moments restart from zero")
            state["step"] = jnp.asarray(int(restored["step"]), jnp.int32)
            resume_step = int(restored["step"])
            logger.info("auto-resumed from %s (step %d)", ck_path, resume_step)
        except Exception as e:  # noqa: BLE001
            logger.warning("auto-resume failed (%s) — fresh start", e)

    # ---- data: one iterator per rotation slot ------------------------------
    def make_bucket_iter(slot_idx, frames, bsz, fps, skip=0):
        # image slots (frames == 1) use the image dataset when configured,
        # matching the reference's joint image/video training
        ds_key = "img_dataset" if (frames == 1 and cfg.get("img_dataset")) \
            else "vid_dataset"
        ds_cfg = dict(cfg[ds_key])
        ds_cfg.setdefault("sample_fps", fps)
        ds_cfg["max_frames"] = frames
        dataset = DATASETS.build(ds_cfg)
        if len(dataset) == 0:
            logger.warning("%s empty — using SyntheticVideoDataset", ds_key)
            dataset = SyntheticVideoDataset(resolution=cfg.resolution,
                                            max_frames=frames,
                                            vit_resolution=cfg.vit_resolution)
        # each host loads its slice of the global batch (the reference's
        # DistributedSampler, train_t2v_enterance.py:125) — host-disjoint
        # streams via a per-process seed offset
        per_host = max(bsz // jax.process_count(), 1)
        return batch_iterator(dataset, per_host,
                              seed=(int(cfg.seed) + 131 * slot_idx + frames
                                    + 7919 * jax.process_index()),
                              skip_batches=skip)

    # fast-forward each slot's batch stream to where an uninterrupted run
    # would be at resume_step: slot i is used by steps {s : s % n == i}
    n_slots = len(bucket_slots)
    skips = [len(range(i, resume_step, n_slots)) for i in range(n_slots)]
    bucket_iters = [make_bucket_iter(i, f, b, fps, skips[i])
                    for i, (f, b, fps) in enumerate(bucket_slots)]
    logger.info("train bucket slots (frames, batch, fps): %s", bucket_slots)

    # empty-prompt embedding for caption dropout (reference zero_y :136-139)
    _, _, zero_y = clip_encoder(text=[""])
    zero_y = replicate_to_mesh(mesh, zero_y)  # host-identical -> global

    # ---- visual hook (reference :271-289) ----------------------------------
    viz = None
    if cfg.get("visual_train") and cfg.visual_train.get("type") in VISUAL:
        viz = VISUAL.build(dict(cfg.visual_train), cfg=cfg, model=model,
                           diffusion=diffusion, autoencoder=autoencoder)

    num_steps = int(cfg.num_steps)
    viz_interval = int(cfg.viz_interval)
    save_interval = int(cfg.save_ckp_interval)
    log_interval = int(cfg.log_interval)
    bsh = batch_sharding(mesh)

    step = resume_step
    t_last = time.time()
    while step < num_steps:
        data_iter = bucket_iters[step % len(bucket_iters)]
        batch = next(data_iter)
        tokens = clip_encoder.tokenize(batch["captions"])
        video = global_batch(mesh, batch["video_data"])
        tokens = global_batch(mesh, tokens)

        # per-step key derived from (base key, step) — NOT chained — so a
        # resumed run replays the exact RNG stream of an uninterrupted run
        k1, k2 = jax.random.split(jax.random.fold_in(key, step))
        x0, y_words = prepare(autoencoder.params, clip_encoder.params,
                              video, tokens, k1)
        state, metrics = train_step(state, x0, y_words, zero_y, k2)
        step = int(state["step"])

        if step % log_interval == 0:
            loss = float(metrics["loss"])
            dt = (time.time() - t_last) / log_interval
            t_last = time.time()
            logger.info("step %d/%d loss %.4f lr %.2e %.2fs/it",
                        step, num_steps, loss, float(schedule(step)), dt)
        if viz is not None and step % viz_interval == 0:
            try:
                viz.run(state["params"], zero_y=zero_y, y_words=y_words,
                        step=step, captions=batch["captions"])
            except Exception as e:  # noqa: BLE001 (reference wraps in try)
                # strict_hooks: re-raise so tests/CI can't silently pass
                # with a broken hook (the reference always swallows,
                # train_t2v_enterance.py:273-289)
                if cfg.get("strict_hooks"):
                    raise
                logger.warning("visual hook failed: %s", e)
        if step % save_interval == 0:
            # all processes participate: orbax coordinates multi-host
            # writes of sharded arrays (process 0 alone would deadlock)
            save_checkpoint(log_dir, state, use_ema)

    logger.info("Congratulations! The training is completed!")
    return state


def latest_checkpoint(log_dir: str):
    """Most recent orbax checkpoint dir under log_dir/checkpoints."""
    import re as _re
    ckdir = osp.join(log_dir, "checkpoints")
    if not osp.isdir(ckdir):
        return None, 0
    steps = []
    for name in os.listdir(ckdir):
        m = _re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None, 0
    step = max(steps)
    return osp.join(ckdir, f"step_{step}"), step


def restore_checkpoint(path: str, state_like):
    """Orbax restore matching the saved payload structure."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(osp.abspath(path))


def save_checkpoint(log_dir: str, state, use_ema: bool):
    """Orbax save of params (+EMA) + step (reference torch.save dicts +
    per-rank EMA shards, :291-309)."""
    try:
        import orbax.checkpoint as ocp
        path = osp.abspath(osp.join(log_dir, "checkpoints",
                                    f"step_{int(state['step'])}"))
        ckptr = ocp.StandardCheckpointer()
        payload = {"params": state["params"], "step": int(state["step"])}
        if use_ema:
            payload["ema"] = state["ema"]
        # opt_state as flat named leaves: its pytree structure (optax
        # NamedTuples, MaskedNode) isn't orbax-serializable, but the leaf
        # list is; restore unflattens with a freshly init'd treedef
        if "opt_state" in state:
            leaves = jax.tree.leaves(state["opt_state"])
            payload["opt_state"] = {f"leaf_{i:04d}": l
                                    for i, l in enumerate(leaves)}
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        logger.info("saved checkpoint %s", path)
    except Exception as e:  # noqa: BLE001
        logger.warning("checkpoint save failed: %s", e)
