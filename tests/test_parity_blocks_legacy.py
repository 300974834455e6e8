"""Torch parity for the legacy block path (USE_TEMPORAL_TRANSFORMER=False).

VERDICT r3 weak #7: blocks_legacy was shape/behavior-tested only, unlike
everything else. Oracle: the reference TemporalAttentionBlock +
RelativePositionBias (tools/modules/unet/util.py:1068-1187, :271-309) on
CPU torch with random weights. The rotary dependency
(rotary-embedding-torch==0.2.1, requirements.txt:20) is reproduced here
faithfully in torch — interleaved-pair rotation, frequencies repeated
[f0,f0,f1,f1,...] — because the package isn't installed; both sides
implement that documented convention, so agreement pins ours to it.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vgen_tpu.models.blocks_legacy import (RelativePositionBias,
                                           TemporalAttentionBlock)

from .ref_loader import load_ref_unet_t2v

torch.manual_seed(0)


class TorchRotary:
    """rotary_embedding_torch==0.2.1 semantics: rotate_queries_or_keys
    over the seq dim with interleaved pairs, first ``dim`` channels."""

    def __init__(self, dim):
        self.dim = dim
        self.inv_freq = torch.from_numpy(
            1.0 / (10000 ** (np.arange(0, dim, 2) / dim))).float()

    def rotate_queries_or_keys(self, t):
        n = t.shape[-2]
        freqs = torch.einsum("i,j->ij", torch.arange(n).float(),
                             self.inv_freq)
        freqs = freqs.repeat_interleave(2, dim=-1)  # [n, dim] interleaved
        t_rot, t_pass = t[..., :self.dim], t[..., self.dim:]
        x1, x2 = t_rot[..., 0::2], t_rot[..., 1::2]
        rotated = torch.stack((-x2, x1), dim=-1).reshape(t_rot.shape)
        out = t_rot * freqs.cos() + rotated * freqs.sin()
        return torch.cat((out, t_pass), dim=-1)


@pytest.fixture(scope="module")
def refutil():
    load_ref_unet_t2v()
    import sys
    return sys.modules["refunet.util"]


def _pair(refutil, use_sim_mask=False, use_image_dataset=False):
    dim, heads = 64, 4  # ref forces dim_head = dim // heads = 16
    ref = refutil.TemporalAttentionBlock(
        dim, heads=heads, rotary_emb=TorchRotary(min(32, dim // heads)),
        use_sim_mask=use_sim_mask, use_image_dataset=use_image_dataset
    ).eval()
    mine = TemporalAttentionBlock(heads=heads, dim_head=dim // heads,
                                  use_sim_mask=use_sim_mask,
                                  use_image_dataset=use_image_dataset)
    x0 = jnp.zeros((1, 2, 4, 4, dim))
    params = mine.init(jax.random.PRNGKey(0), x0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"params": {
        "norm": {"norm": {"scale": jnp.asarray(sd["norm.weight"]),
                          "bias": jnp.asarray(sd["norm.bias"])}},
        "to_qkv": {"kernel": jnp.asarray(sd["to_qkv.weight"].T),
                   "bias": jnp.asarray(sd["to_qkv.bias"])},
        "to_out": {"kernel": jnp.asarray(sd["to_out.weight"].T),
                   "bias": jnp.asarray(sd["to_out.bias"])},
    }}
    return ref, mine, params


def _x(rng, b=2, c=64, f=4, h=4, w=4):
    x = rng.randn(b, c, f, h, w).astype(np.float32)  # torch layout
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))     # [b,f,h,w,c]
    return x, xj


def test_temporal_attention_block_parity(refutil):
    ref, mine, params = _pair(refutil)
    rng = np.random.RandomState(1)
    x, xj = _x(rng)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))
    out = mine.apply(params, xj)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), out_ref.numpy(),
        rtol=2e-3, atol=2e-4)


def test_temporal_attention_block_pos_bias_parity(refutil):
    """With the T5 relative bias from RelativePositionBias — both the
    bias table numerics and its application."""
    ref, mine, params = _pair(refutil)
    rng = np.random.RandomState(2)
    x, xj = _x(rng)
    f, heads = 4, 4

    ref_bias_mod = refutil.RelativePositionBias(heads=heads, num_buckets=8,
                                                max_distance=16)
    mine_bias_mod = RelativePositionBias(heads=heads, num_buckets=8,
                                         max_distance=16)
    table = ref_bias_mod.relative_attention_bias.weight.detach().numpy()
    bias_params = {"params": {"relative_attention_bias": {
        "embedding": jnp.asarray(table)}}}
    with torch.no_grad():
        pos_ref = ref_bias_mod(f, device=torch.device("cpu"))
    pos_mine = mine_bias_mod.apply(bias_params, f)
    np.testing.assert_allclose(np.asarray(pos_mine), pos_ref.numpy(),
                               rtol=1e-5, atol=1e-6)

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), pos_bias=pos_ref)
    out = mine.apply(params, xj, pos_bias=pos_mine)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), out_ref.numpy(),
        rtol=2e-3, atol=2e-4)


def test_temporal_attention_block_video_mask_parity(refutil):
    """Padded-frame masking: reference masks rows AND columns
    (util.py:1152-1155)."""
    ref, mine, params = _pair(refutil)
    rng = np.random.RandomState(3)
    x, xj = _x(rng)
    vm = np.array([[True, True, False, False],
                   [True, True, True, True]])
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), video_mask=torch.from_numpy(vm))
    out = mine.apply(params, xj, video_mask=jnp.asarray(vm))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), out_ref.numpy(),
        rtol=2e-3, atol=2e-4)


def test_temporal_attention_block_focus_present_parity(refutil):
    """Mixed focus-present mask: focused samples attend only to self
    (util.py:1156-1165); the all-True shortcut (:1113-1120) too."""
    ref, mine, params = _pair(refutil)
    rng = np.random.RandomState(4)
    x, xj = _x(rng)
    for fp in (np.array([True, False]), np.array([True, True])):
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x),
                          focus_present_mask=torch.from_numpy(fp))
        out = mine.apply(params, xj, focus_present_mask=jnp.asarray(fp))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 4, 1, 2, 3), out_ref.numpy(),
            rtol=2e-3, atol=2e-4, err_msg=f"focus mask {fp}")


def test_temporal_attention_block_sim_mask_parity(refutil):
    """use_sim_mask: causal tril over frames (util.py:1166-1168)."""
    ref, mine, params = _pair(refutil, use_sim_mask=True)
    rng = np.random.RandomState(5)
    x, xj = _x(rng)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))
    out = mine.apply(params, xj)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), out_ref.numpy(),
        rtol=2e-3, atol=2e-4)


def test_temporal_attention_block_image_dataset_is_identity(refutil):
    ref, mine, params = _pair(refutil, use_image_dataset=True)
    rng = np.random.RandomState(6)
    x, xj = _x(rng)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))
    out = mine.apply(params, xj)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3),
                               out_ref.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(xj), rtol=1e-6, atol=1e-6)
