"""Optimizers and LR schedules (optax).

TPU-native equivalents of the reference training optimization stack:
  * annealing_lr  — reference AnnealingLR (utils/optim/lr_scheduler.py:6-58)
    as an optax schedule: linear warmup + {linear, cosine, none} decay,
    floored at min_lr.
  * adafactor     — optax.adafactor configured like the reference util
    (utils/optim/adafactor.py:8-230).
  * build_optimizer — AdamW(+schedule) matching the engines'
    optim.AdamW(lr, weight_decay) (train_t2v_enterance.py:162-163); on TPU
    there is no GradScaler — bf16 compute keeps f32 master weights.
  * scale_by_label / freeze masks — the Pretrain strategies' per-parameter
    grad_scale / freeze policies (tools/basic_funcs/pretrain_functions.py)
    expressed as optax transforms.
  * ema_update    — EMA as a plain pytree lerp; under pjit the EMA tree
    inherits the params' sharding, which IS the reference's "sharded EMA"
    (train_t2v_enterance.py:157-159) without manual key striding.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def annealing_lr(base_lr: float, warmup_steps: int, total_steps: int,
                 decay_mode: str = "cosine", min_lr: float = 0.0):
    """Reference AnnealingLR semantics as an optax schedule."""
    assert decay_mode in ("linear", "cosine", "none")

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        ratio = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        ratio = jnp.clip(ratio, 0.0, 1.0)
        if decay_mode == "linear":
            decay = base_lr * (1.0 - ratio)
        elif decay_mode == "cosine":
            decay = base_lr * (jnp.cos(jnp.pi * ratio) + 1.0) / 2.0
        else:
            decay = jnp.asarray(base_lr)
        lr = jnp.where((warmup_steps > 0) & (step <= warmup_steps), warm, decay)
        return jnp.maximum(lr, min_lr)

    return schedule


def build_optimizer(lr, weight_decay: float = 0.0, betas=(0.9, 0.999),
                    eps: float = 1e-8, grad_clip: Optional[float] = None,
                    mask=None) -> optax.GradientTransformation:
    """AdamW with optional global-norm clipping and trainable-mask."""
    tx = optax.adamw(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps,
                     weight_decay=weight_decay)
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(tx)
    tx = optax.chain(*chain)
    if mask is not None:
        tx = optax.masked(tx, mask)
    return tx


def adafactor(lr: float = 1e-3, **kwargs) -> optax.GradientTransformation:
    """Adafactor (reference utils/optim/adafactor.py, registered but unused
    by shipped configs)."""
    return optax.adafactor(learning_rate=lr, **kwargs)


def scale_grads_by_mask(scale_fn: Callable[[str], float]):
    """Per-parameter gradient scaling transform: ``scale_fn(path)`` ->
    multiplier. Implements the Pretrain strategies' grad*grad_scale hooks
    (pretrain_functions.py:43-49)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        flat = jax.tree_util.tree_flatten_with_path(updates)[0]
        treedef = jax.tree_util.tree_structure(updates)
        leaves = [g * scale_fn(jax.tree_util.keystr(path))
                  for path, g in flat]
        return jax.tree_util.tree_unflatten(treedef, leaves), state

    return optax.GradientTransformation(init_fn, update_fn)


def freeze_mask(params, trainable_fn: Callable[[str], bool]):
    """Boolean mask pytree for optax.masked: True = trainable."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = [bool(trainable_fn(jax.tree_util.keystr(path)))
              for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def ema_update(ema, params, decay: float):
    """new_ema = params*(1-decay) + ema*decay (reference lerp,
    train_t2v_enterance.py:259-262). Preserves the EMA tree's dtype
    (math in f32 when the EMA is stored bf16)."""
    return jax.tree.map(
        lambda e, p: (e.astype(jnp.float32) * decay
                      + p.astype(jnp.float32) * (1.0 - decay)).astype(e.dtype),
        ema, params)


def scale_by_adam_lowmem(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8,
                         state_dtype=jnp.bfloat16) -> optax.GradientTransformation:
    """Adam with BOTH moments stored in ``state_dtype`` (update math in
    f32). optax.scale_by_adam only lets mu be downcast; storing nu in
    bf16 too halves optimizer-state HBM again — the difference between
    AdamW+EMA fitting one 16 GB chip or not for a 1.4B-param UNet
    (f32 moments+EMA = 22.4 GB > 16 GB; bf16 = 14.0 GB). bf16 keeps the
    f32 exponent range, so nu (an EMA of squares) cannot overflow; the
    8-bit mantissa costs ~1e-2 relative noise on the update scale."""

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=state_dtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params))

    def update_fn(updates, state, params=None):
        count = optax.safe_int32_increment(state.count)

        def moments(g, m, n):
            g32 = g.astype(jnp.float32)
            m32 = m.astype(jnp.float32) * b1 + g32 * (1 - b1)
            n32 = n.astype(jnp.float32) * b2 + (g32 * g32) * (1 - b2)
            return m32, n32

        mn = jax.tree.map(moments, updates, state.mu, state.nu)
        is_pair = lambda x: isinstance(x, tuple)  # noqa: E731
        mu32 = jax.tree.map(lambda t: t[0], mn, is_leaf=is_pair)
        nu32 = jax.tree.map(lambda t: t[1], mn, is_leaf=is_pair)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        new_updates = jax.tree.map(
            lambda m, n: (m / c1) / (jnp.sqrt(n / c2) + eps), mu32, nu32)
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.map(lambda m: m.astype(state_dtype), mu32),
            nu=jax.tree.map(lambda n: n.astype(state_dtype), nu32))
        return new_updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_lowmem(lr, weight_decay: float = 0.0, betas=(0.9, 0.999),
                 eps: float = 1e-8,
                 state_dtype=jnp.bfloat16) -> optax.GradientTransformation:
    """AdamW (reference train_t2v_enterance.py:162-163 semantics: decoupled
    weight decay, same betas/eps) with bf16 optimizer state — the
    single-chip variant; multi-chip FSDP shards the f32 build_optimizer
    moments instead (parallel/mesh.py)."""
    return optax.chain(
        scale_by_adam_lowmem(betas[0], betas[1], eps, state_dtype),
        optax.add_decayed_weights(weight_decay) if weight_decay
        else optax.identity(),
        optax.scale_by_learning_rate(lr))
