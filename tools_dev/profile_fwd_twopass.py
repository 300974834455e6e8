"""Spatial-attention FORWARD study: can MXU/VPU overlap beat the
single-wide-K online-softmax kernel at the UNet hot shape?

Background (round-2 findings): the flash forward at S=1792 runs ~40 TF/s
useful; head_dim=64 halves MXU depth on QK^T (intrinsic) and the softmax
exp keeps the VPU ~40% of kernel time, SERIALIZED between the two
matmuls (QK -> exp -> PV is a dependency chain inside one grid step, and
Mosaic does not software-pipeline compute across grid steps).

Candidates (all numerically standard softmax, compared to _dense_fwd):
  A  naive-full:   s = QK (one matmul) -> rowmax -> exp -> PV (one
                   matmul). The current kernel minus online-rescale.
  B  twopass-NC:   s = QK -> rowmax -> UNROLLED chunks c: exp(s_c) (VPU)
                   then PV_c (MXU). Adjacent chunks are independent, so
                   the scheduler can overlap exp_{c+1} with PV_c.
  C  allchunk-NC:  QK_c -> local max/exp/sum per chunk (deferred
                   rescale), PV_c; single combine at the end. Overlaps
                   QK_{c+1} with exp_c too.

Run on the TPU:  python tools_dev/profile_fwd_twopass.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import importlib

import vgen_tpu  # noqa: F401

# vgen_tpu.ops exports an `attention` FUNCTION; get the module
A = importlib.import_module("vgen_tpu.ops.attention")

BH, S, D = 160, 1792, 64   # c320 spatial level: 32 batch*frames x 5 heads
SCALE = 1.0 / D ** 0.5


def kernel_naive(q_ref, k_ref, v_ref, o_ref, *, scale, sk):
    q = q_ref[0]
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if k_ref.shape[1] != sk:
        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(idx < sk, s, -1e30)
    m = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(axis=-1, keepdims=True)
    acc = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def kernel_twopass(q_ref, k_ref, v_ref, o_ref, *, scale, sk, nc):
    q = q_ref[0]
    skp = k_ref.shape[1]
    w = skp // nc
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if skp != sk:
        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(idx < sk, s, -1e30)
    m = s.max(axis=-1, keepdims=True)
    l = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc = jnp.zeros((q.shape[0], D), jnp.float32)
    for c in range(nc):  # unrolled: exp_{c+1} (VPU) overlaps PV_c (MXU)
        p = jnp.exp(s[:, c * w:(c + 1) * w] - m)
        l = l + p.sum(axis=-1, keepdims=True)
        acc = acc + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, c * w:(c + 1) * w],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def kernel_allchunk(q_ref, k_ref, v_ref, o_ref, *, scale, sk, nc):
    q = q_ref[0]
    skp = k_ref.shape[1]
    w = skp // nc
    ms, ls, accs = [], [], []
    for c in range(nc):
        s = jax.lax.dot_general(q, k_ref[0, c * w:(c + 1) * w],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if (c + 1) * w > sk:
            idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + c * w
            s = jnp.where(idx < sk, s, -1e30)
        m = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        ms.append(m)
        ls.append(p.sum(axis=-1, keepdims=True))
        accs.append(jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, c * w:(c + 1) * w],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    mg = functools.reduce(jnp.maximum, ms)
    l = sum(jnp.exp(m - mg) * lc for m, lc in zip(ms, ls))
    acc = sum(jnp.exp(m - mg) * a for m, a in zip(ms, accs))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def run_kernel(kernel, q, k, v, bq, **kw):
    bh, sq, d = q.shape
    sk = k.shape[1]
    skp = A._ceil_to(sk, 128)
    sqp = A._ceil_to(sq, bq)
    if skp != sk:
        k = jnp.pad(k, ((0, 0), (0, skp - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skp - sk), (0, 0)))
    if sqp != sq:
        q = jnp.pad(q, ((0, 0), (0, sqp - sq), (0, 0)))
    out = pl.pallas_call(
        functools.partial(kernel, scale=SCALE, sk=sk, **kw),
        grid=(bh, sqp // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, skp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, skp, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sqp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sqp * skp * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * sqp * skp),
    )(q, k, v)
    return out[:, :sq]


def bench(name, fn, q, k, v, n=50, flops=None):
    @jax.jit
    def many(q0, k0, v0):
        def step(c, _):
            # carry perturbs inputs so XLA can't hoist the body
            o = fn(c, k0, v0)
            return (q0 + o * 1e-6).astype(q0.dtype), ()
        out, _ = jax.lax.scan(step, q0, None, length=n)
        return out

    o = many(q, k, v)
    _ = np.asarray(o[0, 0, :2])  # force completion through the tunnel
    t0 = time.time()
    o = many(q, k, v)
    _ = np.asarray(o[0, 0, :2])
    dt = (time.time() - t0) / n
    eff = f", {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:28s}: {dt * 1e3:6.2f} ms{eff}", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = (jax.random.normal(kq, (BH, S, D)) * 0.5).astype(jnp.bfloat16)
    k = (jax.random.normal(kk, (BH, S, D)) * 0.5).astype(jnp.bfloat16)
    v = (jax.random.normal(kv, (BH, S, D)) * 0.5).astype(jnp.bfloat16)
    flops = 4 * BH * S * S * D

    # correctness vs dense oracle
    o_ref, _ = jax.jit(lambda a, b, c: A._dense_fwd(a, b, c, SCALE))(q, k, v)
    o_ref = np.asarray(o_ref, np.float32)

    def check(name, o):
        err = np.abs(np.asarray(o, np.float32) - o_ref).max()
        print(f"  {name} max|err| = {err:.4f}")
        assert err < 2e-2, name

    print(f"shape [{BH},{S},{D}] bf16, {flops/1e9:.0f} GFLOP/call")
    base = bench("current _flash_fwd_tpu",
                 lambda a, b, c: A._flash_fwd_tpu(a, b, c, SCALE)[0],
                 q, k, v, flops=flops)
    check("current", A._flash_fwd_tpu(q, k, v, SCALE)[0])

    for bq in (256, 512):
        fn = functools.partial(run_kernel, kernel_naive, bq=bq)
        bench(f"A naive-full bq={bq}", fn, q, k, v, flops=flops)
        check(f"A bq={bq}", fn(q, k, v))
    for bq in (256, 512):
        for nc in (2, 4, 8):
            fn = functools.partial(run_kernel, kernel_twopass, bq=bq, nc=nc)
            t = bench(f"B twopass bq={bq} nc={nc}", fn, q, k, v, flops=flops)
            check(f"B bq={bq} nc={nc}", fn(q, k, v))
    for bq in (256,):
        for nc in (4, 8):
            fn = functools.partial(run_kernel, kernel_allchunk, bq=bq, nc=nc)
            bench(f"C allchunk bq={bq} nc={nc}", fn, q, k, v, flops=flops)
            check(f"C bq={bq} nc={nc}", fn(q, k, v))
    print(f"baseline {base*1e3:.2f} ms — done")




# --------------------------------------------------------------------------- #
# round 2 of the study: micro-optimizations on the winning naive-full form
# --------------------------------------------------------------------------- #
def kernel_naive2(q_ref, k_ref, v_ref, o_ref, *, scale, sk, use_max=True,
                  ones_col=False):
    """naive-full with (a) scale pre-folded into q (caller does it — one
    pass over S*d instead of S^2), (b) optional ones-column V: V padded
    to [sk, 128] with col 64 = 1.0 so the PV matmul emits the softmax
    row-sum on otherwise-idle MXU lanes, (c) optional no-rowmax variant
    (headroom probe only — unsafe for |scores| > 88)."""
    q = q_ref[0]
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if k_ref.shape[1] != sk:
        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(idx < sk, s, -1e30)
    if use_max:
        m = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - m)
    else:
        p = jnp.exp(s)
    if ones_col:
        out = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0] = (out[:, :D] / out[:, D:D + 1]).astype(o_ref.dtype)
    else:
        l = p.sum(axis=-1, keepdims=True)
        acc = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0] = (acc / l).astype(o_ref.dtype)


def run_kernel2(q, k, v, bq, use_max=True, ones_col=False):
    bh, sq, d = q.shape
    sk = k.shape[1]
    skp = A._ceil_to(sk, 128)
    sqp = A._ceil_to(sq, bq)
    q = q * jnp.asarray(SCALE, q.dtype)          # scale folded (1 pass S*d)
    if skp != sk:
        k = jnp.pad(k, ((0, 0), (0, skp - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skp - sk), (0, 0)))
    if sqp != sq:
        q = jnp.pad(q, ((0, 0), (0, sqp - sq), (0, 0)))
    dv = d
    if ones_col:
        pad = jnp.zeros((bh, skp, 128 - d), v.dtype)
        ones = jnp.ones((bh, skp, 1), v.dtype)
        # col d = 1 for real keys only (padded keys already give p=0)
        v = jnp.concatenate([v, ones, pad[..., :-1]], axis=-1)
        dv = 128
    out = pl.pallas_call(
        functools.partial(kernel_naive2, scale=SCALE, sk=sk,
                          use_max=use_max, ones_col=ones_col),
        grid=(bh, sqp // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, skp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, skp, dv), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sqp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sqp * skp * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * sqp * skp),
    )(q, k, v)
    return out[:, :sq]


def main2():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = (jax.random.normal(kq, (BH, S, D)) * 0.5).astype(jnp.bfloat16)
    k = (jax.random.normal(kk, (BH, S, D)) * 0.5).astype(jnp.bfloat16)
    v = (jax.random.normal(kv, (BH, S, D)) * 0.5).astype(jnp.bfloat16)
    flops = 4 * BH * S * S * D
    o_ref, _ = jax.jit(lambda a, b, c: A._dense_fwd(a, b, c, SCALE))(q, k, v)
    o_ref = np.asarray(o_ref, np.float32)

    def check(name, o):
        err = np.abs(np.asarray(o, np.float32) - o_ref).max()
        print(f"  {name} max|err| = {err:.4f}", flush=True)

    bench("current _flash_fwd_tpu",
          lambda a, b, c: A._flash_fwd_tpu(a, b, c, SCALE)[0],
          q, k, v, flops=flops)
    for bq in (256,):
        for use_max, ones_col in ((True, False), (True, True),
                                  (False, False), (False, True)):
            tag = (f"A2 bq={bq} max={int(use_max)} ones={int(ones_col)}")
            fn = functools.partial(run_kernel2, bq=bq, use_max=use_max,
                                   ones_col=ones_col)
            bench(tag, fn, q, k, v, flops=flops)
            check(tag, fn(q, k, v))

    # call-level: 4D entry with transposes (current) — what the UNet pays
    B4, H4 = 32, 5
    q4 = q.reshape(B4, H4, S, D).transpose(0, 2, 1, 3)
    k4 = k.reshape(B4, H4, S, D).transpose(0, 2, 1, 3)
    v4 = v.reshape(B4, H4, S, D).transpose(0, 2, 1, 3)

    def call_current(a, b, c):
        return A.attention(a, b, c)

    @jax.jit
    def many4(q0, k0, v0):
        def step(c, _):
            o = call_current(c, k0, v0)
            return (q0 + o * 1e-6).astype(q0.dtype), ()
        out, _ = jax.lax.scan(step, q0, None, length=50)
        return out

    o = many4(q4, k4, v4)
    _ = np.asarray(o[0, 0, 0, :2])
    t0 = time.time()
    o = many4(q4, k4, v4)
    _ = np.asarray(o[0, 0, 0, :2])
    print(f"call-level 4D attention()    : {(time.time()-t0)/50*1e3:6.2f} ms "
          "(incl. BSHD<->BHSD transposes)", flush=True)


if __name__ == "__main__":
    main2()
