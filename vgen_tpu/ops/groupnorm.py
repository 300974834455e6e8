"""Fused GroupNorm (+ optional SiLU) Pallas kernel for TPU.

NOTE — measured negative result, kept as documentation + utility: wired
into the UNet's GroupNorm32 this kernel REGRESSED the end-to-end t2v
bench 9.8 -> 12.1 s/video. XLA already fuses GroupNorm's
stats/normalize/SiLU into the surrounding convolution prologues; an
opaque pallas_call is a fusion barrier that forces the activation
through HBM on both sides. Standalone (one GN op per dispatch) the
kernel matches flax within measurement noise. Lesson recorded in
doc/ARCHITECTURE.md: only hand-fuse ops XLA cannot fuse (attention's
softmax-matmul chain qualifies; plain norms do not).

The kernel does stats + normalize (+ SiLU) in ONE pass over a
per-batch-element VMEM slab.

Grid: (B,) over flattened leading dims; slab [S, C]. Group reduction
rides the MXU via a constant one-hot [C, G] matrix (cheap at C<=1280,
avoids 1D relayouts that the Mosaic compiler handles poorly).

Gradients: custom_vjp whose backward recomputes through the jnp
reference formulation (one extra fwd in training; inference unaffected).

Equivalent of torch nn.GroupNorm(32, C) used throughout the reference
UNets (reference tools/modules/unet/util.py GroupNorm usage).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# slab bytes (f32) above which we fall back to the jnp path
_MAX_SLAB_F32 = 12 * 1024 * 1024


def _gn_ref(x2, scale, bias, g: int, eps: float, act: Optional[str]):
    """jnp reference: x2 [B, S, C] -> same; f32 stats like flax/torch."""
    b, s, c = x2.shape
    xf = x2.astype(jnp.float32).reshape(b, s, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, s, c) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x2.dtype)


def _gn_kernel(x_ref, s_ref, b_ref, o_ref, *, g: int, eps: float,
               act: Optional[str]):
    x = x_ref[0].astype(jnp.float32)                      # [S, C]
    s, c = x.shape
    cg = c // g
    # one-hot [C, G]: channel i -> group i // cg
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0) // cg
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    onehot = (rows == cols).astype(jnp.float32)
    csum = x.sum(axis=0, keepdims=True)                   # [1, C]
    csq = (x * x).sum(axis=0, keepdims=True)
    n = s * cg
    gmean = jnp.dot(csum, onehot,
                    preferred_element_type=jnp.float32) / n   # [1, G]
    gsq = jnp.dot(csq, onehot, preferred_element_type=jnp.float32) / n
    ginv = jax.lax.rsqrt(gsq - gmean * gmean + eps)
    mean_c = jnp.dot(gmean, onehot.T,
                     preferred_element_type=jnp.float32)      # [1, C]
    inv_c = jnp.dot(ginv, onehot.T, preferred_element_type=jnp.float32)
    y = (x - mean_c) * inv_c * s_ref[:].astype(jnp.float32) \
        + b_ref[:].astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_pallas(x2, scale, bias, g: int, eps: float, act: Optional[str],
               interpret: bool = False):
    b, s, c = x2.shape
    kernel = functools.partial(_gn_kernel, g=g, eps=eps, act=act)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * s * c, transcendentals=b * s * c,
            bytes_accessed=2 * x2.size * x2.dtype.itemsize),
        interpret=interpret,
    )(x2, scale.reshape(1, c), bias.reshape(1, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_fused(x2, scale, bias, g, eps, act):
    return _gn_pallas(x2, scale, bias, g, eps, act)


def _gn_fwd(x2, scale, bias, g, eps, act):
    return _gn_pallas(x2, scale, bias, g, eps, act), (x2, scale, bias)


def _gn_bwd(g, eps, act, res, dy):
    x2, scale, bias = res
    _, vjp = jax.vjp(lambda xx, ss, bb: _gn_ref(xx, ss, bb, g, eps, act),
                     x2, scale, bias)
    return vjp(dy)


_gn_fused.defvjp(_gn_fwd, _gn_bwd)


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               num_groups: int = 32, eps: float = 1e-5,
               act: Optional[str] = None) -> jnp.ndarray:
    """GroupNorm over the trailing channel axis of ``x`` [..., S?, C]
    with torch semantics (contiguous groups, f32 stats), optionally
    fusing a SiLU. Normalizes over all non-leading-batch dims like
    torch GroupNorm on [B, C, *spatial] — here the BATCH axis is axis 0
    and everything between it and C is spatial.
    """
    b = x.shape[0]
    c = x.shape[-1]
    g = min(num_groups, c)
    x2 = x.reshape(b, -1, c)
    s = x2.shape[1]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu or c % g != 0 or s * c * 4 > _MAX_SLAB_F32:
        return _gn_ref(x2, scale, bias, g, eps, act).reshape(x.shape)
    return _gn_fused(x2, scale, bias, g, eps, act).reshape(x.shape)


# ---------------------------------------------------------------------------
# Stats-only fast path (round 3).
#
# Trace evidence (tools_dev/trace_step.py, base 448x256 fwd, batched CFG):
# XLA's GroupNorm stats reductions ("convert_reduce_fusion") cost 42 ms of a
# 190 ms UNet forward — 15-90 GB/s effective on an 819 GB/s part. This path
# hands ONLY the reduction passes to Pallas (one read of x, f32 accumulate
# of sum and sum-of-squares per channel).
#
# MEASURED NEGATIVE RESULT (round 3) — not wired into the UNets: the stats
# kernel itself runs at full bandwidth (2.5 ms/fwd for all 166 norms vs
# XLA's 42 ms), but every wiring regressed the whole forward
# (197 -> 206-214 ms):
#   * jnp folded normalize: XLA re-fuses the multiply-add into every
#     consumer conv prologue (+17 ms of conv time);
#   * Pallas normalize or optimization_barrier: custom-calls need
#     row-major operands while XLA lays conv activations out batch-minor
#     ({3,0,2,1}), so relayout copies appear (+9 ms) and the 5D temporal
#     convs stop being space-partitioned into fusions (2 ms each
#     standalone, +17 ms).
# Lesson (mirrors the fused-kernel note above): XLA's layout assignment is
# globally coupled on this model; a per-norm kernel cannot win without
# also owning the adjacent convolutions. Kept for reuse in models whose
# producers are matmuls (token-major layouts), where the relayout tax
# vanishes.
# ---------------------------------------------------------------------------

# target VMEM bytes for one input block of the stats kernel
_STATS_BLOCK_BYTES = 3 * 1024 * 1024


def _stats_chunk(s: int, c: int, itemsize: int) -> Optional[int]:
    """Largest usable divisor of ``s`` whose [chunk, C] block fits the
    budget. Mosaic requires a chunked (chunk < S) block's sublane dim to
    be a multiple of 8; a whole-array block (chunk == S) is exempt.
    Returns None when no legal chunking exists."""
    cap = max(1, _STATS_BLOCK_BYTES // max(1, c * itemsize))
    if s <= cap:
        return s
    best = None
    i = 1
    while i * i <= s:
        if s % i == 0:
            for d in (i, s // i):
                if d < s and d % 8 == 0 and d <= cap:
                    best = d if best is None else max(best, d)
        i += 1
    return best


def _stats_kernel(x_ref, s1_ref, s2_ref):
    j = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)               # [chunk, C]
    p1 = jnp.sum(xf, axis=0, keepdims=True)         # [1, C]
    p2 = jnp.sum(xf * xf, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _init():
        s1_ref[0] = p1
        s2_ref[0] = p2

    @pl.when(j != 0)
    def _acc():
        s1_ref[0] += p1
        s2_ref[0] += p2


def _stats_pallas(x2, interpret: bool = False):
    b, s, c = x2.shape
    chunk = _stats_chunk(s, c, x2.dtype.itemsize)
    out = pl.pallas_call(
        _stats_kernel,
        grid=(b, s // chunk),
        in_specs=[pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0))],
        out_specs=[pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
                   pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=3 * b * s * c, transcendentals=0,
            bytes_accessed=x2.size * x2.dtype.itemsize),
        interpret=interpret,
    )(x2)
    return out[0][:, 0], out[1][:, 0]


@jax.custom_vjp
def _gn_stats(x2):
    """x2 [B, S, C] -> (sum, sumsq) f32 [B, C], reduced over S."""
    return _stats_pallas(x2)


def _gn_stats_fwd(x2):
    return _stats_pallas(x2), x2


def _gn_stats_bwd(x2, grads):
    ds1, ds2 = grads
    dx = (ds1[:, None, :]
          + 2.0 * x2.astype(jnp.float32) * ds2[:, None, :])
    return (dx.astype(x2.dtype),)


_gn_stats.defvjp(_gn_stats_fwd, _gn_stats_bwd)


def _stats_ref(x2):
    xf = x2.astype(jnp.float32)
    return xf.sum(axis=1), (xf * xf).sum(axis=1)


def _apply_kernel(x_ref, m_ref, a_ref, o_ref):
    xf = x_ref[0].astype(jnp.float32)                   # [chunk, C]
    y = xf * m_ref[0] + a_ref[0]                        # [1,C] broadcasts
    o_ref[0] = y.astype(o_ref.dtype)


def _apply_pallas(x2, mul, add, interpret: bool = False):
    b, s, c = x2.shape
    chunk = _stats_chunk(s, c, x2.dtype.itemsize)
    return pl.pallas_call(
        _apply_kernel,
        grid=(b, s // chunk),
        in_specs=[pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0)),
                  pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
                  pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * c, transcendentals=0,
            bytes_accessed=2 * x2.size * x2.dtype.itemsize),
        interpret=interpret,
    )(x2, mul[:, None, :], add[:, None, :])


@jax.custom_vjp
def _gn_apply(x2, mul, add):
    """y[b,s,c] = x[b,s,c] * mul[b,c] + add[b,c] (f32 math, cast out)."""
    return _apply_pallas(x2, mul, add)


def _gn_apply_fwd(x2, mul, add):
    return _apply_pallas(x2, mul, add), (x2, mul)


def _gn_apply_bwd(res, dy):
    x2, mul = res
    dyf = dy.astype(jnp.float32)
    dx = dyf * mul[:, None, :]
    dmul = jnp.sum(dyf * x2.astype(jnp.float32), axis=1)
    dadd = jnp.sum(dyf, axis=1)
    return dx.astype(x2.dtype), dmul, dadd


_gn_apply.defvjp(_gn_apply_fwd, _gn_apply_bwd)


def group_norm_stats_fast(x: jnp.ndarray, scale: jnp.ndarray,
                          bias: jnp.ndarray, num_groups: int = 32,
                          eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm via two bandwidth-optimal Pallas passes.

    Matches torch ``nn.GroupNorm(num_groups, C)`` on channels-last input
    [B, *spatial, C] (reference UNets' GroupNorm usage,
    tools/modules/unet/util.py): contiguous channel groups, f32 stats
    over all non-batch dims.

    Pass 1 reduces sum/sum-of-squares per channel (one read of x);
    stats + affine then fold into per-(batch, channel) M/A vectors; pass
    2 is the multiply-add. This mirrors XLA's own schedule for flax
    GroupNorm (stats fusion materializing the normalized tensor,
    consumers reading it plainly) — but XLA's stats fusion measures
    15-90 GB/s (42 ms of a 190 ms UNet forward) while these kernels run
    at full bandwidth. Leaving the normalize to jnp instead pushes a
    per-sample multiply-add into every consumer conv prologue, which
    measured +17 ms of conv time (tools_dev/trace_step.py).
    """
    b, c = x.shape[0], x.shape[-1]
    g = min(num_groups, c)
    x2 = x.reshape(b, -1, c)
    s = x2.shape[1]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    fast = (on_tpu and c % g == 0 and s > 1
            and _stats_chunk(s, c, x2.dtype.itemsize) is not None)
    if fast:
        s1, s2 = _gn_stats(x2)
    else:
        s1, s2 = _stats_ref(x2)
    cg = c // g
    n = s * cg
    gs1 = s1.reshape(b, g, cg).sum(-1)                  # [B, G]
    gs2 = s2.reshape(b, g, cg).sum(-1)
    mean = gs1 / n
    var = gs2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.broadcast_to(mean[:, :, None], (b, g, cg)).reshape(b, c)
    inv_c = jnp.broadcast_to(inv[:, :, None], (b, g, cg)).reshape(b, c)
    mul = inv_c * scale.astype(jnp.float32)             # [B, C]
    add = bias.astype(jnp.float32) - mean_c * mul
    dt = x.dtype
    y = x2 * mul[:, None, :].astype(dt) + add[:, None, :].astype(dt)
    if fast:
        # Materialize the normalized tensor ONCE (as XLA itself schedules
        # flax GN): without the barrier XLA re-fuses this multiply-add
        # into every consumer conv prologue (+17 ms/fwd); doing it in a
        # Pallas kernel instead forces relayout copies around the
        # custom-call (conv layouts are batch-minor) — also a loss.
        y = jax.lax.optimization_barrier(y)
    return y.reshape(x.shape)
