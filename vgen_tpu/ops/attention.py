"""Fused attention for TPU: Pallas flash-attention kernel + flash backward.

This is the TPU-native replacement for the reference's xformers
``memory_efficient_attention`` CUDA kernel (reference:
tools/modules/unet/util.py:213-269), which backs every spatial, temporal,
and cross attention in the model zoo. Two workload extremes
(SURVEY.md §7 'hard parts'):

  * spatial attention: few batch rows x many tokens (h*w up to 14400 at
    720p latents) -> classic flash attention, grid over (batch*heads,
    q-blocks), online softmax in f32, K/V streamed through VMEM.
  * temporal attention: huge batch (b*h*w up to ~57k) x tiny tokens
    (f <= 32) -> a flash kernel would waste the MXU; we use a dense
    batched jnp path that XLA fuses into efficient batched matmuls.

Dispatch is automatic on sequence length; both paths share one public
``attention`` API and one custom_vjp. The backward pass implements the
FlashAttention backward recurrence (recompute p from saved q,k,v + lse)
as nested lax.scan over (k-blocks, q-blocks) in pure jnp — bounded
VMEM-sized live tensors, no S^2 residuals, runs on any backend.

No chunking at max_bs=4096 is needed (reference util.py:248-257 works
around a CUDA kernel limit): XLA/Mosaic tile arbitrary batch sizes.
"""

from __future__ import annotations

import contextlib
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flash kernel engages above this sequence length; below it a dense
# batched softmax-attention is faster (temporal attention: seq = frames).
FLASH_MIN_SEQ = 256

_NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# --------------------------------------------------------------------------- #
# Pallas forward kernel
# --------------------------------------------------------------------------- #
def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                      m_scr, l_scr, acc_scr, *, scale: float, sk: int,
                      bk: int, nkb: int):
    """Grid (BH, q-blocks, k-blocks); k is the 'arbitrary' (sequential)
    innermost dim so Mosaic pipelines k/v block DMA with compute while
    the online-softmax state lives in VMEM scratch across k steps.

    q_ref [1,bq,D]; k_ref/v_ref [1,bk,D]; o_ref [1,bq,D]; lse_ref [1,1,bq].
    Scores and accumulation in f32; QK^T and PV ride the MXU in the input
    dtype with f32 accumulation.
    """
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    bq, d = q.shape
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if nkb * bk != sk:  # static: raggedness exists; mask the padded keys
        idx = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + kk * bk
        s = jnp.where(idx < sk, s, _NEG_INF)

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_scr[:, :1] * alpha + p.sum(axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kk == nkb - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_scr[:, :1] + jnp.log(l_scr[:, :1]))[:, 0]


def _flash_fwd_naive_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                            scale: float, sk: int):
    """Whole-K-in-one-block forward: grid (BH, q-blocks), no scratch.

    When the padded key length fits a single block (sk_p <= bk cap, i.e.
    every spatial/cross attention below ~2k tokens), the online-softmax
    machinery of _flash_fwd_kernel is pure overhead: the running
    max/sum/acc scratch read-modify-writes and the alpha rescale cost
    ~11% of kernel time at the UNet hot shape ([160,1792,64] bf16:
    3.29 -> 2.91 ms measured, tools_dev/profile_fwd_twopass.py; chunked
    MXU/VPU-overlap variants all measured SLOWER — Mosaic serializes
    them). This kernel is one QK^T, one rowmax/exp/sum, one PV.
    """
    q = q_ref[0]
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if k_ref.shape[1] != sk:  # static: mask padded keys
        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(idx < sk, s, _NEG_INF)
    m = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(axis=-1, keepdims=True)
    acc = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l))[:, 0]


def _flash_fwd_tpu(q, k, v, scale: float, bq: int = 256, bk: int = 2048,
                   interpret: bool = False):
    """q,k,v: [BH, S, D] -> (o [BH, Sq, D], lse [BH, Sq] f32).

    bk defaults to the full (padded) key length capped at 2048: on v5e a
    single wide K block beats many 512-wide online-softmax steps by ~2x
    at the UNet's hot shape (S=1792: 6.99 -> 3.29 ms, see
    tools_dev/profile_flash_sweep.py); VMEM stays small (scores block
    bq x bk f32 = 2 MB at the cap). When the whole padded K fits one
    block the online-softmax state is dropped entirely
    (_flash_fwd_naive_kernel, another ~11%)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    bq = min(bq, _ceil_to(sq, 128))
    bk = min(bk, _ceil_to(sk, 128))
    sq_p, sk_p = _ceil_to(sq, bq), _ceil_to(sk, bk)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0)))

    nkb = sk_p // bk
    if nkb == 1:
        kernel = functools.partial(_flash_fwd_naive_kernel, scale=scale,
                                   sk=sk)
        o, lse = pl.pallas_call(
            kernel,
            grid=(bh, sq_p // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, sk_p, d), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, sk_p, d), lambda i, j: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, 1, bq), lambda i, j: (i, 0, j)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
                jax.ShapeDtypeStruct((bh, 1, sq_p), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * sq_p * sk_p * d,
                bytes_accessed=(q.size + k.size + v.size)
                * q.dtype.itemsize,
                transcendentals=bh * sq_p * sk_p),
            interpret=interpret,
        )(q, k, v)
        return o[:, :sq], lse[:, 0, :sq]

    grid = (bh, sq_p // bq, nkb)
    kernel = functools.partial(_flash_fwd_kernel, scale=scale, sk=sk, bk=bk,
                               nkb=nkb)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
            # lse kept 3D: (1, 1, bq) blocks satisfy the (8,128) tiling rule
            pl.BlockSpec((1, 1, bq), lambda i, j, kk: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, sq_p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # running max
            pltpu.VMEM((bq, 128), jnp.float32),  # running sum
            pltpu.VMEM((bq, d), jnp.float32),    # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_p * sk_p * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p),
        interpret=interpret,
    )(q, k, v)
    return o[:, :sq], lse[:, 0, :sq]


# --------------------------------------------------------------------------- #
# dense path (small seq / any backend) — also the numerics oracle
# --------------------------------------------------------------------------- #
def _dense_fwd(q, k, v, scale: float):
    """Batched dense attention, f32 softmax. q,k,v: [BH, S, D]."""
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    m = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(axis=-1, keepdims=True)
    o = jnp.einsum("bqk,bkd->bqd", (p / l).astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    lse = (m + jnp.log(l))[..., 0]
    return o.astype(q.dtype), lse


# --------------------------------------------------------------------------- #
# tiny-sequence kernel (temporal attention): pack batch into the lanes
# --------------------------------------------------------------------------- #
# Temporal self-attention has S = frames (<= 32) and a huge batch
# (b*h*w*heads). XLA's batched-dot path pads the [BH, S, S] scores to
# (8, 128) tiles — 8x HBM expansion at S=16 — and materializes them on
# both sides of the softmax (matmul outputs can't fuse on TPU). Measured:
# 1.19 ms at [17920, 16, 64] bf16 — ~1 TF/s of useful work.
#
# This kernel packs P = 128 // S batch items into one 128-row tile, so
# the scores block is a dense [P*S, P*S] VMEM tile that never touches
# HBM. The cross-item score entries are computed (MXU is idle otherwise)
# and masked to -inf: softmax over a row then only sees its own item's
# band, and the p @ v matmul is exact because off-band p is 0. The
# backward reuses the packing: all three grads come from one tile-local
# kernel (no cross-tile reductions).


def _tiny_block_mask(ps: int, s: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (ps, ps), 0) // s
    c = jax.lax.broadcasted_iota(jnp.int32, (ps, ps), 1) // s
    return r == c


def _tiny_band_softmax(sc, pack: int, s: int):
    """Softmax over the block-diagonal band of a packed [pack*s, pack*s]
    score tile: off-band entries are masked to -inf, so each row's
    softmax sees only its own item's s keys and off-band p is exactly 0.
    Returns (p_full [ps, ps], m [ps, 1], l [ps, 1]).

    (A compacted-band variant that runs the exp on [pack, s, s] — 8x
    fewer lanes — needs 2D<->4D shape casts Mosaic rejects
    ('infer-vector-layout: unsupported shape cast'); the masked full
    tile is the Mosaic-compatible form.)"""
    ps = pack * s
    scm = jnp.where(_tiny_block_mask(ps, s), sc, _NEG_INF)
    m = scm.max(axis=-1, keepdims=True)
    e = jnp.exp(scm - m)
    l = e.sum(axis=-1, keepdims=True)
    return e / l, m, l


def _tiny_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                     s: int, pack: int):
    """Block holds T groups of `pack` items; the static python loop
    unrolls T group-bodies back-to-back in one program so the per-grid
    DMA/dispatch overhead amortizes (one group per program measured
    SLOWER than the XLA dense path)."""
    pt, s_, d = q_ref.shape
    ps = pack * s_
    for t in range(pt // pack):
        sl = slice(t * pack, (t + 1) * pack)
        q = q_ref[sl].reshape(ps, d)
        k = k_ref[sl].reshape(ps, d)
        v = v_ref[sl].reshape(ps, d)
        sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        p, m, l = _tiny_band_softmax(sc, pack, s)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[sl] = o.reshape(pack, s_, d).astype(o_ref.dtype)
        lse_ref[sl] = (m + jnp.log(l)).reshape(pack, s_)


def _tiny_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale: float, s: int, pack: int):
    """All three grads from one tile-local pass. The softmax is
    recomputed from scratch (no lse input): bitwise-identical to the
    forward's p by construction, and Mosaic rejects the (pack, s) ->
    (pack*s, 1) shape cast an lse input would need."""
    pt, s_, d = q_ref.shape
    ps = pack * s_
    for t in range(pt // pack):
        sl = slice(t * pack, (t + 1) * pack)
        q = q_ref[sl].reshape(ps, d)
        k = k_ref[sl].reshape(ps, d)
        v = v_ref[sl].reshape(ps, d)
        do = do_ref[sl].reshape(ps, d)

        sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        p, _, _ = _tiny_band_softmax(sc, pack, s)
        pc = p.astype(do.dtype)
        o = jax.lax.dot_general(pc, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        dsum = (do.astype(jnp.float32) * o).sum(axis=-1, keepdims=True)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dsum) * scale
        dsc = ds.astype(q.dtype)
        dq = jax.lax.dot_general(dsc, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(dsc, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[sl] = dq.reshape(pack, s_, d).astype(dq_ref.dtype)
        dk_ref[sl] = dk.reshape(pack, s_, d).astype(dk_ref.dtype)
        dv_ref[sl] = dv.reshape(pack, s_, d).astype(dv_ref.dtype)


def _tiny_pack(q, pack: int):
    bh = q.shape[0]
    g = -(-bh // pack)
    if g * pack != bh:
        q = jnp.pad(q, ((0, g * pack - bh),) + ((0, 0),) * (q.ndim - 1))
    return q, g


def _tiny_dims(bh: int, s: int):
    """(pack items per 128-row group, T groups per program, grid)."""
    pack = max(1, 128 // s)
    t = max(1, 2048 // (pack * s))  # ~2048 rows per program
    block_items = pack * t
    g = -(-bh // block_items)
    return pack, block_items, g


def _tiny_fwd_tpu(q, k, v, scale: float, interpret: bool = False):
    """q,k,v: [BH, S, D], small S -> (o, lse)."""
    bh, s, d = q.shape
    pack, block_items, g = _tiny_dims(bh, s)
    q, _ = _tiny_pack(q, block_items)
    k, _ = _tiny_pack(k, block_items)
    v, _ = _tiny_pack(v, block_items)
    kernel = functools.partial(_tiny_fwd_kernel, scale=scale, s=s,
                               pack=pack)
    spec = pl.BlockSpec((block_items, s, d), lambda i: (i, 0, 0))
    o, lse = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, pl.BlockSpec((block_items, s), lambda i: (i, 0))],
        out_shape=[
            jax.ShapeDtypeStruct((g * block_items, s, d), q.dtype),
            jax.ShapeDtypeStruct((g * block_items, s), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * block_items * s * pack * s * d,
            bytes_accessed=4 * bh * s * d * q.dtype.itemsize,
            transcendentals=g * block_items * s * pack * s),
        interpret=interpret,
    )(q, k, v)
    return o[:bh], lse[:bh]


def _tiny_bwd_tpu(q, k, v, o, lse, do, scale: float,
                  interpret: bool = False):
    """o/lse accepted for vjp-signature symmetry; the kernel recomputes
    the softmax tile-locally instead (see _tiny_bwd_kernel)."""
    del o, lse
    bh, s, d = q.shape
    pack, block_items, g = _tiny_dims(bh, s)
    q, _ = _tiny_pack(q, block_items)
    k, _ = _tiny_pack(k, block_items)
    v, _ = _tiny_pack(v, block_items)
    do, _ = _tiny_pack(do, block_items)
    kernel = functools.partial(_tiny_bwd_kernel, scale=scale, s=s,
                               pack=pack)
    spec = pl.BlockSpec((block_items, s, d), lambda i: (i, 0, 0))
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((g * block_items, s, d),
                                        q.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * g * block_items * s * pack * s * d,
            bytes_accessed=7 * bh * s * d * q.dtype.itemsize,
            transcendentals=g * block_items * s * pack * s),
        interpret=interpret,
    )(q, k, v, do)
    return dq[:bh], dk[:bh], dv[:bh]


# --------------------------------------------------------------------------- #
# flash backward (jnp, nested scans; recompute-from-lse)
# --------------------------------------------------------------------------- #
def _flash_bwd(q, k, v, o, lse, do, scale: float, bq: int = 256,
               bk: int = 256):
    """FlashAttention backward: dq,dk,dv without materializing S^2."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    bq = min(bq, _ceil_to(sq, 128))
    bk = min(bk, _ceil_to(sk, 128))
    sq_p, sk_p = _ceil_to(sq, bq), _ceil_to(sk, bk)

    f32 = jnp.float32
    qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0))).astype(f32)
    op = jnp.pad(o, ((0, 0), (0, sq_p - sq), (0, 0))).astype(f32)
    dop = jnp.pad(do, ((0, 0), (0, sq_p - sq), (0, 0))).astype(f32)
    # padded q rows get lse=+inf => p=0 => no contribution
    lsep = jnp.pad(lse, ((0, 0), (0, sq_p - sq)), constant_values=jnp.inf)
    kp = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0))).astype(f32)
    vp = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0))).astype(f32)

    dsum = (dop * op).sum(axis=-1)  # [BH, Sq_p]
    nqb, nkb = sq_p // bq, sk_p // bk
    kmask = (jnp.arange(sk_p) < sk)  # padded keys contribute nothing

    def k_step(dq, kb_idx):
        kb = jax.lax.dynamic_slice_in_dim(kp, kb_idx * bk, bk, 1)
        vb = jax.lax.dynamic_slice_in_dim(vp, kb_idx * bk, bk, 1)
        kmb = jax.lax.dynamic_slice_in_dim(kmask, kb_idx * bk, bk, 0)

        def q_step(carry, qb_idx):
            dq, dkb, dvb = carry
            qb = jax.lax.dynamic_slice_in_dim(qp, qb_idx * bq, bq, 1)
            dob = jax.lax.dynamic_slice_in_dim(dop, qb_idx * bq, bq, 1)
            lseb = jax.lax.dynamic_slice_in_dim(lsep, qb_idx * bq, bq, 1)
            db = jax.lax.dynamic_slice_in_dim(dsum, qb_idx * bq, bq, 1)

            s = jnp.einsum("bqd,bkd->bqk", qb, kb) * scale
            s = jnp.where(kmask_b(kmb, s.shape), s, _NEG_INF)
            p = jnp.exp(s - lseb[..., None])
            dvb = dvb + jnp.einsum("bqk,bqd->bkd", p, dob)
            dp = jnp.einsum("bqd,bkd->bqk", dob, vb)
            ds = p * (dp - db[..., None]) * scale
            dq_blk = jnp.einsum("bqk,bkd->bqd", ds, kb)
            dq = jax.lax.dynamic_update_slice_in_dim(
                dq, jax.lax.dynamic_slice_in_dim(dq, qb_idx * bq, bq, 1)
                + dq_blk, qb_idx * bq, 1)
            dkb = dkb + jnp.einsum("bqk,bqd->bkd", ds, qb)
            return (dq, dkb, dvb), None

        zeros_kb = jnp.zeros((bh, bk, d), f32)
        (dq, dkb, dvb), _ = jax.lax.scan(
            q_step, (dq, zeros_kb, zeros_kb), jnp.arange(nqb))
        return dq, (dkb, dvb)

    dq0 = jnp.zeros((bh, sq_p, d), f32)
    dq, (dks, dvs) = jax.lax.scan(k_step, dq0, jnp.arange(nkb))
    dk = dks.transpose(1, 0, 2, 3).reshape(bh, sk_p, d)
    dv = dvs.transpose(1, 0, 2, 3).reshape(bh, sk_p, d)
    return (dq[:, :sq].astype(q.dtype), dk[:, :sk].astype(k.dtype),
            dv[:, :sk].astype(v.dtype))


def kmask_b(kmb, shape):
    return jnp.broadcast_to(kmb[None, None, :], shape)


# --------------------------------------------------------------------------- #
# Pallas backward kernels (TPU): dkdv over k-blocks, dq over q-blocks.
# Standard FlashAttention-2 backward split — each kernel recomputes the
# probability block from (q, k, lse), so no S^2 residual is ever
# materialized and both kernels are pure MXU matmul chains. Replaces the
# nested-scan jnp backward (kept below as the any-backend oracle), whose
# dq read-modify-write serialized the whole pass (VERDICT r1 weak #4).
# --------------------------------------------------------------------------- #
def _flash_bwd_dkdv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                           dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float,
                           sk: int, bk: int, nqb: int):
    """Grid (BH, k-blocks, q-blocks); q sequential innermost.

    q_ref/do_ref [1,bq,D]; k_ref/v_ref [1,bk,D]; lse_ref/dsum_ref [1,1,bq];
    dk_ref/dv_ref [1,bk,D].
    """
    qq = pl.program_id(2)

    @pl.when(qq == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse_ref[0, 0][:, None])  # [bq, bk]; padded q rows: 0
    pc = p.astype(do.dtype)
    dv_scr[:] += jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dsum_ref[0, 0][:, None]) * scale
    dk_scr[:] += jax.lax.dot_general(ds.astype(q.dtype), q,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(qq == nqb - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                         dq_ref, dq_scr, *, scale: float, sk: int, bk: int,
                         nkb: int):
    """Grid (BH, q-blocks, k-blocks); k sequential innermost."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if nkb * bk != sk:  # mask padded keys: their k rows are zero, so
        # they'd contribute nothing to dq either way — but exp(0-lse) can
        # overflow for very negative lse; mask for safety (as fwd does)
        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kk * bk
        s = jnp.where(idx < sk, s, _NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dsum_ref[0, 0][:, None]) * scale
    dq_scr[:] += jax.lax.dot_general(ds.astype(k.dtype), k,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(kk == nkb - 1)
    def _():
        dq_ref[0] = (dq_scr[:]).astype(dq_ref.dtype)


def _flash_bwd_tpu(q, k, v, o, lse, do, scale: float, bq: int = 256,
                   bk: int = 2048, interpret: bool = False):
    """Pallas flash backward. q,k,v,o,do: [BH,S,D]; lse [BH,Sq] f32.

    bk defaults to full-K (capped 2048), mirroring the forward kernel's
    tuning: at the UNet hot shape (BH=320, S=1792, bf16) the on-chip
    sweep gives 22.6 ms at (256,512) vs 15.1 ms at (256,2048) — 2.24x
    the jnp nested-scan backward (tools_dev/profile_attn_bwd_sweep.py)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    bq = min(bq, _ceil_to(sq, 128))
    bk = min(bk, _ceil_to(sk, 128))
    sq_p, sk_p = _ceil_to(sq, bq), _ceil_to(sk, bk)

    dsum = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                   axis=-1)  # [BH, Sq]
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, sq_p - sq), (0, 0)))
        # padded q rows: lse=+inf => p=0 => no contribution anywhere
        lse = jnp.pad(lse, ((0, 0), (0, sq_p - sq)),
                      constant_values=jnp.inf)
        dsum = jnp.pad(dsum, ((0, 0), (0, sq_p - sq)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0)))
    lse3 = lse[:, None, :]
    dsum3 = dsum[:, None, :]

    nqb, nkb = sq_p // bq, sk_p // bk

    dkv_kernel = functools.partial(_flash_bwd_dkdv_kernel, scale=scale,
                                   sk=sk, bk=bk, nqb=nqb)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, nkb, nqb),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, kk, j: (i, j, 0)),   # q
            pl.BlockSpec((1, bk, d), lambda i, kk, j: (i, kk, 0)),  # k
            pl.BlockSpec((1, bk, d), lambda i, kk, j: (i, kk, 0)),  # v
            pl.BlockSpec((1, bq, d), lambda i, kk, j: (i, j, 0)),   # do
            pl.BlockSpec((1, 1, bq), lambda i, kk, j: (i, 0, j)),   # lse
            pl.BlockSpec((1, 1, bq), lambda i, kk, j: (i, 0, j)),   # dsum
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda i, kk, j: (i, kk, 0)),
            pl.BlockSpec((1, bk, d), lambda i, kk, j: (i, kk, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk_p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=5 * bh * sq_p * sk_p * d,
            bytes_accessed=(q.size + k.size + v.size + do.size)
            * q.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p),
        interpret=interpret,
    )(q, k, v, do, lse3, dsum3)

    dq_kernel = functools.partial(_flash_bwd_dq_kernel, scale=scale,
                                  sk=sk, bk=bk, nkb=nkb)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, nqb, nkb),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),   # q
            pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0)),  # k
            pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0)),  # v
            pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),   # do
            pl.BlockSpec((1, 1, bq), lambda i, j, kk: (i, 0, j)),   # lse
            pl.BlockSpec((1, 1, bq), lambda i, j, kk: (i, 0, j)),   # dsum
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype)],
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=5 * bh * sq_p * sk_p * d,
            bytes_accessed=(q.size + k.size + v.size + do.size)
            * q.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p),
        interpret=interpret,
    )(q, k, v, do, lse3, dsum3)[0]

    return dq[:, :sq], dk[:, :sk], dv[:, :sk]


# --------------------------------------------------------------------------- #
# custom_vjp wiring + public API
# --------------------------------------------------------------------------- #
def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _use_flash(sq: int, sk: int) -> bool:
    return _on_tpu() and max(sq, sk) >= FLASH_MIN_SEQ


def _use_tiny(sq: int, sk: int) -> bool:
    """Tiny-kernel dispatch — BACKWARD only. Forward: the XLA dense path
    and the packed kernel measured within noise of each other (1.2-1.3 ms
    at [17920,16,64] bf16), so the fusible XLA form wins. Backward: the
    jnp fallback pads S=16 to 128 and scans — 16.1 ms vs 2.2 ms for the
    packed kernel (7.4x), ~150 ms of a 1.2 s train step across the
    UNet's ~17 temporal attentions (tools_dev/profile_tiny_attn.py).

    Restricted to 128 % sq == 0: _tiny_dims packs pack=128//s rows per
    tile and the (pack, s, d)->(pack*s, s*d... ) reshapes are only
    lane-aligned when pack*s == 128 exactly — e.g. s=24 would give
    120-row tiles that Mosaic may reject on real TPU. Other sizes fall
    back to _flash_bwd/jnp."""
    return _on_tpu() and sq == sk and sq <= 64 and 128 % sq == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_bhsd(q, k, v, scale):
    if _use_flash(q.shape[1], k.shape[1]):
        o, _ = _flash_fwd_tpu(q, k, v, scale)
    else:
        o, _ = _dense_fwd(q, k, v, scale)
    return o


def _attention_fwd(q, k, v, scale):
    if _use_flash(q.shape[1], k.shape[1]):
        o, lse = _flash_fwd_tpu(q, k, v, scale)
    else:
        o, lse = _dense_fwd(q, k, v, scale)
    return o, (q, k, v, o, lse)


def _attention_bwd(scale, res, do):
    q, k, v, o, lse = res
    if _use_flash(q.shape[1], k.shape[1]):
        return _flash_bwd_tpu(q, k, v, o, lse, do, scale)
    if _use_tiny(q.shape[1], k.shape[1]):
        return _tiny_bwd_tpu(q, k, v, o, lse, do, scale)
    return _flash_bwd(q, k, v, o, lse, do, scale)


_attention_bhsd.defvjp(_attention_fwd, _attention_bwd)


# --------------------------------------------------------------------------- #
# spatially-sharded inference routing (use_zero_infer / sp mesh)
# --------------------------------------------------------------------------- #
# GSPMD cannot auto-partition a Mosaic (Pallas) kernel: compiling the
# 720p denoise step over an sp mesh on the real TPU compiler fails with
# "Mosaic kernels cannot be automatically partitioned. Please wrap the
# call in a shard_map." (the CPU dryrun masked this — flash is disabled
# off-TPU). Engines that shard activations over a spatial mesh enter
# spatial_shard_ctx around the UNet apply; attention() then runs the
# kernel INSIDE a shard_map over the token axis — all-gather K/V for
# self-attention (one ICI collective; K/V fit per-device), K/V
# replicated for cross-attention (no collective) — instead of a bare
# pallas_call. Same math as sp_attention.allgather_attention
# (SURVEY §5.7), specialized to the sharded-inference layout.

_SPATIAL_CTX: list = []


@contextlib.contextmanager
def spatial_shard_ctx(mesh, axis: str = "sp"):
    """Route long-sequence attention through shard_map over ``axis`` of
    ``mesh`` while tracing. No-op when mesh is None."""
    if mesh is None:
        yield
        return
    _SPATIAL_CTX.append((mesh, axis))
    try:
        yield
    finally:
        _SPATIAL_CTX.pop()


def _sharded_attention(q, k, v, scale: float, mesh, axis: str):
    """q,k,v: [B, S, H, D] global shapes, token axis sharded over
    ``axis`` (self-attn) or replicated keys (cross-attn)."""
    from jax.sharding import PartitionSpec as P

    b, sq, h, d = q.shape
    sk = k.shape[1]
    self_attn = sk == sq
    qspec = P(None, axis, None, None)
    kvspec = qspec if self_attn else P(None, None, None, None)

    def local(qb, kb, vb):
        bl, sql, hl, dl = qb.shape
        q2 = qb.transpose(0, 2, 1, 3).reshape(bl * hl, sql, dl)
        k2 = kb.transpose(0, 2, 1, 3).reshape(bl * hl, kb.shape[1], dl)
        v2 = vb.transpose(0, 2, 1, 3).reshape(bl * hl, vb.shape[1], dl)
        if self_attn:
            k2 = jax.lax.all_gather(k2, axis, axis=1, tiled=True)
            v2 = jax.lax.all_gather(v2, axis, axis=1, tiled=True)
        o = _attention_bhsd(q2, k2, v2, scale)
        return o.reshape(bl, hl, sql, dl).transpose(0, 2, 1, 3)

    return jax.shard_map(local, mesh=mesh, in_specs=(qspec, kvspec, kvspec),
                         out_specs=qspec, check_vma=False)(q, k, v)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              scale: Optional[float] = None,
              bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Multi-head scaled-dot-product attention.

    q: [B, Sq, H, D]; k, v: [B, Sk, H, D]. Returns [B, Sq, H, D].
    scale defaults to 1/sqrt(D) (matching xformers' default used by the
    reference). Flash kernel on TPU for long sequences, fused dense
    batched attention otherwise. ``bias`` is an additive [Sq, Sk] score
    bias (e.g. a causal mask) — dense path only (used for short text
    sequences; the flash kernel is for long unmasked visual sequences).
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if _SPATIAL_CTX and bias is None and sq >= FLASH_MIN_SEQ:
        mesh, axis = _SPATIAL_CTX[-1]
        if sq % mesh.shape[axis] == 0:
            return _sharded_attention(q, k, v, scale, mesh, axis)
    if bias is not None:
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        s = s + bias.astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    o = _attention_bhsd(qf, kf, vf, scale)
    return o.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def flash_attention_tpu(q, k, v, scale: Optional[float] = None,
                        interpret: bool = False):
    """Direct kernel entry (testing/benchmarks): q,k,v [BH, S, D]."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _flash_fwd_tpu(q, k, v, scale, interpret=interpret)
