"""Pretrain key-policy cross-check against the reference's shipped JSON.

The reference drives its 2D->video transfer policy (freeze / grad-scale)
off ``data/stable_diffusion_image_key_temporal_attention_x1.json`` — 682
torch keys of the SD-derived spatial subset of the UNet (reference:
tools/basic_funcs/pretrain_functions.py:9-54, consumed at :43-49). Our
``pretrain_specific_strategies`` tests membership through the flax->torch
path translation (engines/pretrain.py:32-38); if that translation ever
drifts from the reference naming, the freeze policy silently becomes a
no-op. This test pins it: EVERY key in the shipped JSON must be reachable
from our full-size UNetSD_T2VBase param tree via ``keystr_to_torch_key``.

Uses ``jax.eval_shape`` so the 1.4B-param tree is never allocated.
"""

import json
import os

import jax
import jax.numpy as jnp
import pytest

import vgen_tpu  # noqa: F401 — registration side effects
from vgen_tpu.core import MODEL, default_cfg
from vgen_tpu.engines.pretrain import (keystr_to_torch_key,
                                       pretrain_specific_strategies)

SD_KEYS = os.path.join(os.path.dirname(__file__), "..", "data",
                       "stable_diffusion_image_key_temporal_attention_x1.json")


def _full_unet_torch_keys():
    """Torch keys derivable from our full-size t2v UNet param structure."""
    cfg = default_cfg()
    model = MODEL.build(dict(cfg.UNet, out_dim=4))
    x = jnp.zeros((1, 2, 32, 56, 4))
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1, 77, 1024))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, t, y=y))
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
    keys = {}
    for path, leaf in flat:
        keystr = "".join(f"['{p.key}']" for p in path)
        keys[keystr_to_torch_key(keystr)] = (keystr, leaf.shape)
    return keys


def test_shipped_sd_keys_fully_covered_by_translator():
    with open(SD_KEYS) as f:
        sd_keys = json.load(f)
    assert len(sd_keys) == 682  # the reference asset, copied verbatim
    ours = _full_unet_torch_keys()
    missing = [k for k in sd_keys if k not in ours]
    assert not missing, (
        f"{len(missing)} shipped policy keys unreachable from our param "
        f"tree (translator drift => silent freeze no-op), e.g. "
        f"{missing[:8]}")


def test_policy_fns_act_on_real_tree():
    """The strategy built from the shipped JSON must actually scale/freeze
    a large fraction of leaves (not silently no-op) and leave temporal
    params trainable (reference pretrain_functions.py:43-49)."""
    with open(SD_KEYS) as f:
        sd_keys = set(json.load(f))
    ours = _full_unet_torch_keys()

    _, grad_scale_fn, trainable_fn, _ = pretrain_specific_strategies(
        params=None, sd_keys_path=SD_KEYS, grad_scale=0.5, fix_weight=True)

    scaled = [ks for ks, _ in ours.values()
              if grad_scale_fn(ks) == pytest.approx(0.5)]
    frozen = [ks for ks, _ in ours.values() if not trainable_fn(ks)]
    # every shipped key maps to exactly one of our leaves
    assert len(scaled) == len(sd_keys)
    assert len(frozen) == len(sd_keys)
    # temporal-side params stay trainable at full gradient
    temporal = [ks for ks, _ in ours.values() if "temporal" in ks]
    assert temporal
    assert all(trainable_fn(ks) for ks in temporal)
    assert all(grad_scale_fn(ks) == 1.0 for ks in temporal)
