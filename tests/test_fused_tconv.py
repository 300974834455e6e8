"""Fused TemporalConvBlock kernel vs the flax module composition.

The fused path (ops/fused_tconv.py) must reproduce the unfused
TemporalConvBlock — 4x [GroupNorm32 -> SiLU -> Conv(3,1,1)] + identity
(models/blocks.py; reference tools/modules/unet/util.py:1652-1697) —
up to bf16 accumulation ordering. Runs the Pallas kernels in
interpreter mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgen_tpu.models import blocks
from vgen_tpu.models.blocks import TemporalConvBlock
from vgen_tpu.ops import fused_tconv


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


def _make_block(key, shape):
    """Init a TemporalConvBlock with NON-zero last-conv weights (the
    zero-init conv4 would make the chain a no-op and hide tap bugs)."""
    tc = TemporalConvBlock(deterministic=True, dtype=jnp.bfloat16)
    x = (jax.random.normal(key, shape) * 0.5).astype(jnp.bfloat16)
    params = tc.init(jax.random.PRNGKey(0), x)
    k = jax.random.normal(jax.random.PRNGKey(1),
                          params["params"]["conv4_conv"]["kernel"].shape)
    params = jax.tree_util.tree_map(lambda p: p, params)
    params["params"]["conv4_conv"]["kernel"] = (k * 0.05).astype(
        params["params"]["conv4_conv"]["kernel"].dtype)
    params["params"]["conv4_conv"]["bias"] = (
        jax.random.normal(jax.random.PRNGKey(2),
                          params["params"]["conv4_conv"]["bias"].shape)
        * 0.05)
    return tc, params, x


@pytest.mark.parametrize("shape", [
    (2, 16, 4, 8, 320),    # hw=32 tile, base-width chain
    (1, 8, 8, 16, 320),    # hw=128 tile, 8-frame bucket
    (2, 16, 2, 16, 640),   # hw=32 tile, 640-width chain
])
def test_fused_chain_matches_flax(shape):
    tc, params, x = _make_block(jax.random.PRNGKey(3), shape)
    want = tc.apply(params, x)
    got = fused_tconv.fused_temporal_conv_chain(
        x, params["params"], interpret=True)
    assert got.shape == want.shape
    assert _rel_err(got, want) < 2e-2


def test_fused_module_path_matches_unfused():
    """TemporalConvBlock with the fusion flag forced on (interpret) must
    match the module's unfused output on the same params."""
    tc, params, x = _make_block(jax.random.PRNGKey(4), (2, 16, 4, 8, 320))
    want = tc.apply(params, x)
    old = blocks.FUSED_TCONV
    blocks.FUSED_TCONV = "interpret"
    try:
        got = tc.apply(params, x)
    finally:
        blocks.FUSED_TCONV = old
    assert got.shape == want.shape
    assert _rel_err(got, want) < 2e-2


def test_fusable_dispatch():
    bf16 = jnp.bfloat16
    assert fused_tconv.fusable(16, 320, 32 * 56, bf16)    # base 448x256
    assert fused_tconv.fusable(16, 320, 88 * 160, bf16)   # 720p level 1
    assert fused_tconv.fusable(16, 640, 44 * 80, bf16)    # 720p level 2
    assert fused_tconv.fusable(8, 320, 16 * 28, bf16)
    assert not fused_tconv.fusable(1, 320, 32 * 56, bf16)   # image batch
    assert not fused_tconv.fusable(16, 1280, 22 * 40, bf16)  # width off
    assert not fused_tconv.fusable(16, 320, 7 * 13, bf16)  # no exact tile
    assert not fused_tconv.fusable(16, 320, 32 * 56, jnp.float32)


def test_image_paths_keep_flax(monkeypatch):
    """multiply-zero variants and non-deterministic (training) blocks must
    not route through the kernel even when the flag forces fusion."""
    def _boom(*a, **k):
        raise AssertionError("fused path taken")

    monkeypatch.setattr(fused_tconv, "fused_temporal_conv_chain", _boom)
    monkeypatch.setattr(blocks, "FUSED_TCONV", "interpret")

    for kw, shape in [
        (dict(use_image_dataset=True), (1, 16, 4, 8, 320)),
        (dict(zero_if_single_frame=True), (1, 1, 4, 8, 320)),
        (dict(deterministic=False, dropout=0.1), (1, 16, 4, 8, 320)),
    ]:
        tc = TemporalConvBlock(dtype=jnp.bfloat16, **kw)
        x = jnp.ones(shape, jnp.bfloat16)
        params = tc.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, x)
        tc.apply(params, x, rngs={"dropout": jax.random.PRNGKey(2)})
