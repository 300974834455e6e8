"""Tiny-attention fwd v4 experiment: matmul-gather band compaction.

Goal: run the exp on [s, ps] (64x fewer lanes at s=16) instead of the
masked [ps, ps] tile, with everything 2D (Mosaic rejects 4D casts).
Scores are computed TRANSPOSED (k @ q^T) so the compaction is a left
matmul by a 0/1 selector, no transposes anywhere:

  sc_T[c, r]      = k[c]. q[r] * scale
  band_T[j, r]    = sc_T[(r//s)*s + j, r]   via  G2 @ (mask * sc_T)
  p_T[j, r]       = softmax_j band_T
  p_full_T[c, r]  = mask * (G2^T-scatter of p_T)
  o[r, d]         = sum_c p_full_T[c, r] v[c, d]

RESULT (measured on v5e, bf16, [17920,16,64]): 3.55 ms vs 2.90 ms for
the XLA dense path — the two selector matmuls + masked wheres cost more
than the compacted exp saves. Third and final fwd attempt (v2 masked
full-tile: 1.08x-at-best; 4D-reshape compaction: Mosaic-rejected); the
tiny-kernel WIN is the backward (7.4x, shipped in ops/attention.py).
The XLA dense forward stays the dispatch for S<=64.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vgen_tpu.ops.attention import (_dense_fwd, _tiny_dims, _tiny_pack,
                                    _tiny_block_mask)

N = 20
BH, S, D = 17920, 16, 64


def _v4_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, s: int,
               pack: int):
    pt, s_, d = q_ref.shape
    ps = pack * s_
    mask = _tiny_block_mask(ps, s)
    # G2[j, c] = 1.0 iff c % s == j
    g2 = (jax.lax.broadcasted_iota(jnp.int32, (s, ps), 1) % s
          == jax.lax.broadcasted_iota(jnp.int32, (s, ps), 0)
          ).astype(jnp.float32)
    for t in range(pt // pack):
        sl = slice(t * pack, (t + 1) * pack)
        q = q_ref[sl].reshape(ps, d)
        k = k_ref[sl].reshape(ps, d)
        v = v_ref[sl].reshape(ps, d)
        sc_t = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32) * scale
        masked = jnp.where(mask, sc_t, 0.0)
        band_t = jax.lax.dot_general(g2, masked, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        m = band_t.max(axis=0, keepdims=True)
        e = jnp.exp(band_t - m)
        l = e.sum(axis=0, keepdims=True)
        p_t = e / l                                   # [s, ps]
        scat = jax.lax.dot_general(g2, p_t, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        p_full_t = jnp.where(mask, scat, 0.0)         # [ps(c), ps(r)]
        o = jax.lax.dot_general(p_full_t.astype(v.dtype), v,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[sl] = o.reshape(pack, s_, d).astype(o_ref.dtype)


def v4_fwd(q, k, v, scale, interpret=False):
    bh, s, d = q.shape
    pack, block_items, g = _tiny_dims(bh, s)
    q, _ = _tiny_pack(q, block_items)
    k, _ = _tiny_pack(k, block_items)
    v, _ = _tiny_pack(v, block_items)
    kernel = functools.partial(_v4_kernel, scale=scale, s=s, pack=pack)
    spec = pl.BlockSpec((block_items, s, d), lambda i: (i, 0, 0))
    o = pl.pallas_call(
        kernel, grid=(g,), in_specs=[spec, spec, spec], out_specs=[spec],
        out_shape=[jax.ShapeDtypeStruct((g * block_items, s, d), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q, k, v)[0]
    return o[:bh]


def timeit(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    np.asarray(c(*args))
    t0 = time.time()
    np.asarray(c(*args))
    return (time.time() - t0) / N


def scanned(body, nout=1):
    def run(*a):
        def step(c, _):
            out = body(a[0] + c, *a[1:])
            outs = out if isinstance(out, tuple) else (out,)
            ssum = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            return (ssum * 1e-30).astype(a[0].dtype), None
        acc, _ = jax.lax.scan(step, jnp.zeros((), a[0].dtype), None,
                              length=N)
        return acc
    return run


if __name__ == "__main__":
    rng = np.random.RandomState(0)
    qf = jnp.asarray(rng.randn(7, S, D).astype(np.float32))
    kf = jnp.asarray(rng.randn(7, S, D).astype(np.float32))
    vf = jnp.asarray(rng.randn(7, S, D).astype(np.float32))
    scale = D ** -0.5
    # correctness (interpret)
    o4 = v4_fwd(qf, kf, vf, scale, interpret=True)
    oref, _ = _dense_fwd(qf, kf, vf, scale)
    err = np.abs(np.asarray(o4) - np.asarray(oref)).max()
    print(f"v4 interpret max-err vs dense: {err:.2e}")
    # on the axon backend the DENSE reference itself runs f32 matmuls
    # as bf16 MXU passes (~5e-3 rel); exact-math check is the CPU run
    assert err < 2e-2

    q = jnp.asarray(rng.randn(BH, S, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(BH, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(BH, S, D), jnp.bfloat16)
    t_dense = timeit(scanned(lambda q, k, v: _dense_fwd(q, k, v, scale)),
                     q, k, v)
    t_v4 = timeit(scanned(lambda q, k, v: v4_fwd(q, k, v, scale)), q, k, v)
    print(f"dense: {t_dense*1e3:.3f} ms   v4: {t_v4*1e3:.3f} ms   "
          f"speedup {t_dense/t_v4:.2f}x")
