"""Legacy block variants: shape contracts + behavior checks."""

import jax
import jax.numpy as jnp
import numpy as np

from vgen_tpu.models.blocks_legacy import (AttentionBlock,
                                           InitTemporalConvBlock,
                                           RelativePositionBias,
                                           ResidualBlock,
                                           TemporalAttentionBlock,
                                           TemporalAttentionMultiBlock,
                                           TemporalConvBlockV1,
                                           CrossAttentionMasked,
                                           apply_rotary, rotary_embedding)


def test_relative_position_bias():
    m = RelativePositionBias(heads=4)
    p = m.init(jax.random.PRNGKey(0), 8)
    bias = m.apply(p, 8)
    assert bias.shape == (4, 8, 8)
    b = np.asarray(bias)
    # translation invariance along the diagonal (bucketed rel positions)
    np.testing.assert_allclose(b[:, 0, 1], b[:, 3, 4], atol=1e-6)


def test_rotary_preserves_norm():
    cos, sin = rotary_embedding(8, 16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 8, 16), jnp.float32)
    y = apply_rotary(x, cos, sin)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(x), axis=-1),
                               np.linalg.norm(np.asarray(y), axis=-1),
                               rtol=1e-5)


def test_temporal_attention_block_focus_present():
    m = TemporalAttentionBlock(heads=2, dim_head=8)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 4, 4, 4, 16),
                    jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out.shape == x.shape
    # focus_present=True must also work (identity-attention path)
    fp = jnp.ones((1,), bool)
    out2 = m.apply(p, x, None, fp)
    assert np.isfinite(np.asarray(out2)).all()


def test_temporal_multiblock_and_convs():
    x = jnp.zeros((1, 4, 4, 4, 16))
    m = TemporalAttentionMultiBlock(heads=2, dim_head=8,
                                    temporal_attn_times=2)
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == x.shape

    for cls in (InitTemporalConvBlock, TemporalConvBlockV1):
        mod = cls()
        pp = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(pp, x)
        # zero-init last conv => identity at init
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_residual_and_attention_blocks():
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 16), jnp.float32)
    emb = jnp.zeros((2, 32))
    rb = ResidualBlock(out_channels=24)
    p = rb.init(jax.random.PRNGKey(0), x, emb)
    assert rb.apply(p, x, emb).shape == (2, 8, 8, 24)

    ab = AttentionBlock(heads=2)
    p = ab.init(jax.random.PRNGKey(0), x)
    out = ab.apply(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_masked_cross_attention():
    m = CrossAttentionMasked(heads=2, dim_head=8)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 6, 16), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    mask = jnp.where(jnp.arange(6)[None, :] < 3, 0.0, -1e9)
    out = m.apply(p, x, None, mask)
    assert out.shape == x.shape
