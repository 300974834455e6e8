"""Attention op tests: dense path vs naive oracle, Pallas kernel in
interpret mode vs dense, flash backward vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgen_tpu.ops import attention
from vgen_tpu.ops.attention import (_attention_bhsd, _dense_fwd, _flash_bwd,
                                    _flash_bwd_tpu, _tiny_bwd_tpu,
                                    _tiny_fwd_tpu, flash_attention_tpu)


def naive(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))


def test_dense_matches_naive():
    rng = np.random.RandomState(0)
    q = rng.randn(4, 37, 64).astype(np.float32)
    k = rng.randn(4, 53, 64).astype(np.float32)
    v = rng.randn(4, 53, 64).astype(np.float32)
    scale = 64 ** -0.5
    o, lse = _dense_fwd(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale)
    exp = naive(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale)
    np.testing.assert_allclose(np.asarray(o), np.asarray(exp), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("sq,sk", [(256, 256), (300, 300), (128, 515)])
def test_flash_kernel_interpret_matches_dense(sq, sk):
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(2, sq, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(2, sk, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(2, sk, 64).astype(np.float32))
    scale = 64 ** -0.5
    o, lse = flash_attention_tpu(q, k, v, scale, interpret=True)
    o_ref, lse_ref = _dense_fwd(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_backward_matches_autodiff():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(2, 70, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 45, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 45, 32).astype(np.float32))
    do = jnp.asarray(rng.randn(2, 70, 32).astype(np.float32))
    scale = 32 ** -0.5

    # autodiff through the naive implementation
    def f(q, k, v):
        return naive(q, k, v, scale)

    _, vjp = jax.vjp(f, q, k, v)
    dq_e, dk_e, dv_e = vjp(do)

    o, lse = _dense_fwd(q, k, v, scale)
    dq, dk, dv = _flash_bwd(q, k, v, o, lse, do, scale, bq=32, bk=16)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_e), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_e), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_e), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("sq,sk,bq,bk", [
    (256, 256, 128, 128),   # exact tiling
    (300, 300, 128, 128),   # ragged q AND k padding
    (128, 515, 128, 256),   # ragged k only
    (1792, 1792, 256, 512), # the UNet hot shape, default-ish blocks
])
def test_flash_bwd_pallas_interpret_matches_autodiff(sq, sk, bq, bk):
    """The Pallas backward kernels (dkdv + dq) vs autodiff through the
    naive oracle, interpret mode (runs on CPU)."""
    rng = np.random.RandomState(5)
    d = 64
    q = jnp.asarray(rng.randn(2, sq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(2, sk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(2, sk, d).astype(np.float32))
    do = jnp.asarray(rng.randn(2, sq, d).astype(np.float32))
    scale = d ** -0.5

    _, vjp = jax.vjp(lambda q, k, v: naive(q, k, v, scale), q, k, v)
    dq_e, dk_e, dv_e = vjp(do)

    o, lse = _dense_fwd(q, k, v, scale)
    dq, dk, dv = _flash_bwd_tpu(q, k, v, o, lse, do, scale, bq=bq, bk=bk,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_e),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_e),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_e),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("bh,s", [
    (16, 16),    # exact pack (P=8, two tiles)
    (19, 16),    # ragged batch padding
    (8, 32),     # P=4
    (7, 12),     # S not a divisor of 128 (P=10, 120-row tiles)
    (5, 1),      # single-frame (image batches)
])
@pytest.mark.slow
def test_tiny_kernel_interpret_matches_dense(bh, s):
    """Packed tiny-seq kernel (temporal attention) vs the dense oracle,
    forward + backward, interpret mode."""
    rng = np.random.RandomState(6)
    d = 64
    q = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    do = jnp.asarray(rng.randn(bh, s, d).astype(np.float32))
    scale = d ** -0.5

    o, lse = _tiny_fwd_tpu(q, k, v, scale, interpret=True)
    o_ref, lse_ref = _dense_fwd(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref),
                               rtol=2e-4, atol=2e-4)

    _, vjp = jax.vjp(lambda q, k, v: naive(q, k, v, scale), q, k, v)
    dq_e, dk_e, dv_e = vjp(do)
    dq, dk, dv = _tiny_bwd_tpu(q, k, v, o, lse, do, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_e),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_e),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_e),
                               rtol=2e-3, atol=2e-3)


def test_custom_vjp_end_to_end():
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(2, 24, 2, 16).astype(np.float32))
    kv = jnp.asarray(rng.randn(2, 31, 2, 16).astype(np.float32))

    def loss_fn(q, kv):
        return attention(q, kv, kv).sum()

    g_q, g_kv = jax.grad(loss_fn, argnums=(0, 1))(q, kv)

    def loss_ref(q, kv):
        b, sq, h, d = q.shape
        sk = kv.shape[1]
        qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
        kf = kv.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
        return naive(qf, kf, kf, d ** -0.5).sum()

    e_q, e_kv = jax.grad(loss_ref, argnums=(0, 1))(q, kv)
    np.testing.assert_allclose(np.asarray(g_q), np.asarray(e_q), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_kv), np.asarray(e_kv), rtol=1e-3, atol=1e-3)


def test_attention_bf16():
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(1, 40, 4, 64), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 40, 4, 64), jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 40, 4, 64), jnp.bfloat16)
    o = attention(q, k, v)
    assert o.dtype == jnp.bfloat16
    o32 = attention(q.astype(jnp.float32), k.astype(jnp.float32),
                    v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(o, dtype=np.float32),
                               np.asarray(o32), rtol=0.1, atol=0.1)
