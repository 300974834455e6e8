"""Matmul conv formulations (blocks.CONV_IMPL="matmul") compute the same
function as the XLA conv lowering, with interchangeable param pytrees —
so a checkpoint trained/imported under one formulation loads under the
other. Also pins the stats-GN path (GN_IMPL="stats") against flax.

Layout-flip context: see blocks.py CONV_IMPL docstring and
tools_dev/profile_layout_flip.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from vgen_tpu.models import blocks
from vgen_tpu.models.blocks import (GroupNorm32, ResBlock, _MMConv2d3x3,
                                    _MMConvT3)


@pytest.fixture(autouse=True)
def _restore_flags():
    conv, gn = blocks.CONV_IMPL, blocks.GN_IMPL
    yield
    blocks.CONV_IMPL, blocks.GN_IMPL = conv, gn


def test_mm_conv2d_matches_xla_conv():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 9, 11, 16))
    ref = nn.Conv(24, (3, 3), padding=1)
    mm = _MMConv2d3x3(24)
    p = ref.init(jax.random.PRNGKey(1), x)
    # identical param pytree: apply the SAME params through both
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        mm.init(jax.random.PRNGKey(2), x))
    np.testing.assert_allclose(mm.apply(p, x), ref.apply(p, x),
                               atol=1e-4, rtol=1e-4)


def test_mm_convt_matches_xla_conv():
    v = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4, 6, 16))
    ref = nn.Conv(16, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)))
    mm = _MMConvT3(16)
    p = ref.init(jax.random.PRNGKey(1), v)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        mm.init(jax.random.PRNGKey(2), v))
    np.testing.assert_allclose(mm.apply(p, v), ref.apply(p, v),
                               atol=1e-4, rtol=1e-4)


def test_stats_gn_matches_flax():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 7, 5, 64)) * 3 + 1
    gn = GroupNorm32()
    blocks.GN_IMPL = "flax"
    p = gn.init(jax.random.PRNGKey(1), x)
    ref = gn.apply(p, x)
    blocks.GN_IMPL = "stats"
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        gn.init(jax.random.PRNGKey(2), x))
    np.testing.assert_allclose(gn.apply(p, x), ref, atol=1e-4, rtol=1e-4)


def test_resblock_formulations_agree():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 7, 32))
    emb = jax.random.normal(jax.random.PRNGKey(1), (8, 64))
    rb = ResBlock(out_channels=32)
    blocks.CONV_IMPL, blocks.GN_IMPL = "xla", "flax"
    p = rb.init(jax.random.PRNGKey(2), x, emb, 2)
    ref = rb.apply(p, x, emb, 2)
    blocks.CONV_IMPL, blocks.GN_IMPL = "matmul", "stats"
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        rb.init(jax.random.PRNGKey(3), x, emb, 2))
    out = rb.apply(p, x, emb, 2)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_mm_conv_grads_flow():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 5, 8))
    mm = _MMConv2d3x3(8)
    p = mm.init(jax.random.PRNGKey(1), x)

    def loss(p):
        return (mm.apply(p, x) ** 2).mean()

    g = jax.grad(loss)(p)
    assert all(bool(jnp.isfinite(v).all()) for v in jax.tree_util.tree_leaves(g))
    assert float(jnp.abs(g["params"]["kernel"]).sum()) > 0
