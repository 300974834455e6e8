"""Sequence-parallel attention vs the single-device op on the virtual
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vgen_tpu.ops.attention import attention
from vgen_tpu.ops.sp_attention import sp_attention
from vgen_tpu.parallel.mesh import create_mesh
import pytest


def _qkv(b=2, s=64, h=2, d=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    mk = lambda k: jax.random.normal(k, (b, s, h, d), jnp.float32)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


def test_ring_attention_matches_dense():
    mesh = create_mesh(data=1, fsdp=1, tensor=8)
    q, k, v = _qkv()
    ref = attention(q, k, v)
    out = sp_attention(q, k, v, mesh, axis="tensor", mode="ring")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_allgather_attention_matches_dense():
    mesh = create_mesh(data=1, fsdp=1, tensor=8)
    q, k, v = _qkv(seed=1)
    ref = attention(q, k, v)
    out = sp_attention(q, k, v, mesh, axis="tensor", mode="allgather")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_ring_attention_under_jit_grad():
    """The ring path must be differentiable (scan/ppermute grads)."""
    mesh = create_mesh(data=1, fsdp=1, tensor=8)
    q, k, v = _qkv(s=32, seed=2)

    def loss_sp(q, k, v):
        return (sp_attention(q, k, v, mesh, mode="ring") ** 2).sum()

    def loss_ref(q, k, v):
        return (attention(q, k, v) ** 2).sum()

    g1 = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_spatial_shard_ctx_routes_through_shard_map():
    """attention() inside spatial_shard_ctx must produce the unsharded
    result via the shard_map route (the GSPMD-safe path the sharded-
    inference engines trace on real TPU: self-attn all-gathers K/V,
    cross-attn replicates them — a bare pallas_call cannot be
    auto-partitioned by GSPMD)."""
    import importlib

    from vgen_tpu.parallel.mesh import spatial_infer_mesh
    A = importlib.import_module("vgen_tpu.ops.attention")

    mesh = spatial_infer_mesh()
    assert mesh is not None
    # sq >= FLASH_MIN_SEQ so the route engages; sq % 8 == 0
    q, k, v = _qkv(b=1, s=512, h=2, d=16, seed=2)
    ref = attention(q, k, v)
    with A.spatial_shard_ctx(mesh, axis="sp"):
        assert A._SPATIAL_CTX
        out = jax.jit(attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert not A._SPATIAL_CTX

    # cross-attention branch: short replicated keys
    kc, vc = k[:, :77], v[:, :77]
    ref_c = attention(q, kc, vc)
    with A.spatial_shard_ctx(mesh, axis="sp"):
        out_c = jax.jit(attention)(q, kc, vc)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c),
                               rtol=2e-5, atol=2e-5)
