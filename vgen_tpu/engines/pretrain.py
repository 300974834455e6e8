"""Pretrain / resume strategies (PRETRAIN registry).

TPU-native equivalent of the reference strategies
(reference: tools/basic_funcs/pretrain_functions.py:9-193). Each strategy
returns ``(params, grad_scale_fn, trainable_fn, resume_step)``:

  * params       — possibly loaded from ``resume_checkpoint``
  * grad_scale_fn(keystr) -> float   — the reference's grad*grad_scale
    hooks (:43-49) as an optax transform input
  * trainable_fn(keystr) -> bool     — freeze policy for optax.masked
  * resume_step  — parsed from the checkpoint filename (:51)

Key-list policies come from the same ``sd_keys_path`` JSON files the
reference ships (torch key names); membership is tested through the
flax->torch path translation, so the policy files work verbatim.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Callable, Optional, Set, Tuple

from ..core.registry import PRETRAIN
from ..utils.ckpt import load_unet_params, translate_unet

logger = logging.getLogger(__name__)


def keystr_to_torch_key(keystr: str) -> str:
    """"['params']['input_blocks_0_0']['kernel']" -> reference torch key."""
    segs = re.findall(r"\['([^']+)'\]|\.([A-Za-z0-9_]+)", keystr)
    segs = [a or b for a, b in segs]
    if segs and segs[0] == "params":
        segs = segs[1:]
    return translate_unet(segs)


def _parse_step(path: str) -> int:
    m = re.findall(r"(\d+)", os.path.basename(path))
    return int(m[-1]) if m else 0


def _load_sd_keys(sd_keys_path: Optional[str]) -> Set[str]:
    if sd_keys_path and os.path.exists(sd_keys_path):
        with open(sd_keys_path) as f:
            return set(json.load(f))
    if sd_keys_path:
        logger.warning("sd_keys_path %s missing — no key policy", sd_keys_path)
    return set()


@PRETRAIN.register_function()
def pretrain_specific_strategies(params, resume_checkpoint=None,
                                 sd_keys_path=None, grad_scale: float = 1.0,
                                 fix_weight: bool = False, **kwargs):
    """Load ckpt; keys listed in sd_keys_path are frozen (fix_weight) or
    gradient-scaled (reference :9-54)."""
    step = 0
    if resume_checkpoint and os.path.exists(resume_checkpoint):
        params = load_unet_params(resume_checkpoint, params, strict=False)
        step = _parse_step(resume_checkpoint)
        logger.info("resumed %s at step %d", resume_checkpoint, step)
    elif resume_checkpoint:
        logger.warning("resume_checkpoint %s missing — fresh init",
                       resume_checkpoint)

    sd_keys = _load_sd_keys(sd_keys_path)

    def grad_scale_fn(keystr: str) -> float:
        if not sd_keys:
            return 1.0
        return grad_scale if keystr_to_torch_key(keystr) in sd_keys else 1.0

    def trainable_fn(keystr: str) -> bool:
        if not sd_keys or not fix_weight:
            return True
        return keystr_to_torch_key(keystr) not in sd_keys

    return params, grad_scale_fn, trainable_fn, step


@PRETRAIN.register_function()
def pretrain_from_sd(params, resume_checkpoint=None, **kwargs):
    """Plain 2D-SD -> video transfer load (reference stub)."""
    return pretrain_specific_strategies(params, resume_checkpoint, **kwargs)


@PRETRAIN.register_function()
def pretrain_ema_model(params, resume_checkpoint=None, **kwargs):
    """Load EMA weights as the live params (reference stub)."""
    return pretrain_specific_strategies(params, resume_checkpoint, **kwargs)


@PRETRAIN.register_function()
def pretrain_dreamvideo(params, resume_checkpoint=None,
                        train_adapter: bool = True, fix_spatial: bool = True,
                        fix_temporal: bool = False, **kwargs):
    """DreamVideo policy: train adapters / selected attention params,
    freeze spatial and/or temporal weights (reference :57-109).
    Reference configs spell the flags ``fix_spatial_weight`` /
    ``fix_temporal_weight`` (configs/dreamvideo/*Learning/*.yaml) —
    both spellings are honored."""
    if "fix_spatial_weight" in kwargs:
        fix_spatial = bool(kwargs["fix_spatial_weight"])
    if "fix_temporal_weight" in kwargs:
        fix_temporal = bool(kwargs["fix_temporal_weight"])
    step = 0
    if resume_checkpoint and os.path.exists(resume_checkpoint):
        params = load_unet_params(resume_checkpoint, params, strict=False)
        step = _parse_step(resume_checkpoint)

    def trainable_fn(keystr: str) -> bool:
        if "adapter" in keystr:
            return train_adapter
        is_temporal = "temporal" in keystr
        if is_temporal:
            return not fix_temporal
        return not fix_spatial

    return params, (lambda k: 1.0), trainable_fn, step


@PRETRAIN.register_function()
def pretrain_instructvideo(params, resume_checkpoint=None,
                           spatial_grad_scale: float = 1.0,
                           temporal_grad_scale: float = 1.0, **kwargs):
    """InstructVideo policy: LoRA-only trainable, split spatial/temporal
    grad scales (reference :112-193)."""
    step = 0
    if resume_checkpoint and os.path.exists(resume_checkpoint):
        params = load_unet_params(resume_checkpoint, params, strict=False)
        step = _parse_step(resume_checkpoint)

    def trainable_fn(keystr: str) -> bool:
        return "lora" in keystr

    def grad_scale_fn(keystr: str) -> float:
        if "temporal" in keystr:
            return temporal_grad_scale
        return spatial_grad_scale

    return params, grad_scale_fn, trainable_fn, step
