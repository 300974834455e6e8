"""Fused TemporalConvBlock chain — one Pallas kernel per GN-SiLU-conv stage.

The ResBlock's temporal pseudo-3D chain (models/blocks.py
TemporalConvBlock; reference tools/modules/unet/util.py:1652-1697) is
4x [GroupNorm32 -> SiLU -> Conv(3,1,1)] + identity. On the XLA path each
stage costs ~3 HBM passes over the activation (GN stats reduce, conv
read, conv write; trace_step.py measured the GN stats fusions at 15-90
GB/s), ~13 passes for the chain. Per-GN Pallas kernels LOSE here (two
measured attempts, see GroupNorm32's docstring): a custom call that does
not own the adjacent convs just inserts relayout copies. This kernel
owns the convs.

Decomposition: the (3,1,1) conv mixes only the F frames of one spatial
position, and GN normalization (given the per-(sample, group) stats) is
elementwise — so everything except the stats reduction is row-parallel
over spatial positions. Each stage runs as ONE kernel over [F, hw_tile]
token blocks of [B, F, H*W, C]:

  * normalize (stats passed in, exact flax f32 form) -> SiLU -> the
    3-tap frame conv as three [F*hw, C] x [C, C] MXU matmuls with the
    tap outputs shifted along F in VMEM: one HBM read + one write;
  * the kernel also emits per-block channel sums of its OUTPUT (sum,
    sum of squares), so the NEXT stage's GN stats come from a tiny XLA
    finalize over [B, nblocks, 2, C] partials instead of a full
    re-read of the activation;
  * stage 4 adds the identity residual in-kernel and skips the stats.

HBM traffic: 1 stats pass over the input + 4 x (read + write) + the
identity read ~= 10 passes vs ~13 unfused, plus every GN/SiLU runs at
kernel bandwidth instead of XLA's strided stats fusions.

Weight budget is trivial (3*C*C bf16 = 0.6 MB at C=320, 2.4 MB at
C=640); the block size is capped by activation VMEM (f32 temps), not
weights. Zero-padded F edges match flax's conv padding; spatial tiles
must divide H*W exactly (a padded tile would pollute the next stage's
stats), enforced by ``fusable``.

Numerics match the flax path: GN stats and normalize in f32 (eps 1e-5),
SiLU on the bf16-rounded normalized value, matmuls bf16 x bf16 with f32
accumulation, bias added in f32, output rounded to bf16 per stage (the
stats for the next stage are computed from the rounded values, like the
unfused path sees them). Inference-only — the training path keeps the
flax modules (dropout between stages, single numeric path across
student/teacher, engines/train_*.py).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Conv formulation: single K=3C concat-matmul (default) vs three K=C tap
# matmuls. Measured on-chip (tools_dev/profile_fused_tconv.py, v5e):
# concat wins at every dispatchable shape — 1.34x/1.50x vs flax at the
# base-t2v levels (2,16,32,56,320)/(2,16,16,28,640) and 1.04x/1.01x at
# the 720p grids (where the chain is MXU-bound and the 3-tap form's
# K=320 tiles the MXU poorly; 3-tap measured 1.26x/1.48x/0.96x/0.98x).
_K_CONCAT = os.environ.get("VGEN_TCONV_KCAT", "1") == "1"


def _mm(a, b):
    """bf16 x bf16 matmul, f32 accumulation (XLA bf16-dot semantics)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _gn_silu_conv(x, mean, rstd, gs, gb, w0, w1, w2, b):
    """The stage body on one [F, R, C] block (all VMEM values).

    x bf16; mean/rstd/gs/gb [1, C] f32 per-channel stats+affine;
    w* [C, C] bf16; b [1, C]. Returns ([F, R, C] bf16 conv output with
    bias, f32 pre-cast not kept)."""
    f, r, c = x.shape
    xf = x.astype(jnp.float32)
    y = ((xf - mean[None]) * rstd[None]) * gs[None] + gb[None]
    # SiLU from the bf16-rounded normalized value (what the flax path
    # sees), arithmetic in f32 — Mosaic's bf16 sigmoid lowering hits a
    # vector.broadcast verifier bug (f32 scalar into bf16 vector)
    ybf = y.astype(x.dtype).astype(jnp.float32)
    n = (ybf * jax.nn.sigmoid(ybf)).astype(x.dtype)
    if _K_CONCAT:
        # one K=3C matmul on concat(prev, x, next): 3x the MXU
        # arithmetic intensity of three K=C taps (K=320 tiles poorly)
        zrow = jnp.zeros((1, r, c), n.dtype)
        cat = jnp.concatenate([
            jnp.concatenate([zrow, n[:-1]], axis=0),
            n,
            jnp.concatenate([n[1:], zrow], axis=0)], axis=-1)
        wcat = jnp.concatenate([w0, w1, w2], axis=0)  # [3C, C]
        out = (jax.lax.dot_general(
            cat.reshape(f * r, 3 * c), wcat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(f, r, c)
            + b[None].astype(jnp.float32))
        return out.astype(x.dtype)
    flat = n.reshape(f * r, c)
    y0 = _mm(flat, w0).reshape(f, r, c)  # tap for frame f-1 -> out[f]
    y1 = _mm(flat, w1).reshape(f, r, c)  # center tap
    y2 = _mm(flat, w2).reshape(f, r, c)  # tap for frame f+1 -> out[f]
    zrow = jnp.zeros((1, r, c), jnp.float32)
    out = (y1
           + jnp.concatenate([zrow, y0[:-1]], axis=0)
           + jnp.concatenate([y2[1:], zrow], axis=0)
           + b[None].astype(jnp.float32))
    return out.astype(x.dtype)


def _stage_kernel(x_ref, mean_ref, rstd_ref, gs_ref, gb_ref,
                  w0_ref, w1_ref, w2_ref, b_ref, out_ref, ps_ref):
    out = _gn_silu_conv(x_ref[0], mean_ref[0], rstd_ref[0],
                        gs_ref[...], gb_ref[...],
                        w0_ref[...], w1_ref[...], w2_ref[...], b_ref[...])
    out_ref[0] = out
    of = out.astype(jnp.float32)
    ps_ref[0, 0, 0] = of.sum(axis=(0, 1))
    ps_ref[0, 0, 1] = (of * of).sum(axis=(0, 1))


def _last_stage_kernel(x_ref, id_ref, mean_ref, rstd_ref, gs_ref, gb_ref,
                       w0_ref, w1_ref, w2_ref, b_ref, out_ref):
    out = _gn_silu_conv(x_ref[0], mean_ref[0], rstd_ref[0],
                        gs_ref[...], gb_ref[...],
                        w0_ref[...], w1_ref[...], w2_ref[...], b_ref[...])
    out_ref[0] = id_ref[0] + out  # bf16 residual add (flax identity + x)


def _hw_tile(hw: int, f: int, c: int) -> Optional[int]:
    """Largest spatial tile in {128, 64, 32} that divides hw and keeps
    f*tile tokens within the VMEM budget (~2048 tokens at C<=384, 1024
    at C=640 — f32 temps dominate; weights are <2.5 MB)."""
    cap = 2048 if c <= 384 else 1024
    for t in (128, 64, 32):
        if hw % t == 0 and f * t <= cap:
            return t
    return None


def fusable(f: int, c: int, hw: int, dtype) -> bool:
    """Static dispatch gate. c is pinned to the on-chip-validated widths
    {320, 640} (the two that carry ~80% of temporal-conv HBM traffic in
    the model zoo; C=1280 levels hold <15% and keep XLA). f >= 2 (f == 1
    goes through the multiply-zero image path anyway)."""
    return (f >= 2 and c in (320, 640) and dtype == jnp.bfloat16
            and _hw_tile(hw, f, c) is not None)


def _finalize_stats(partials, groups: int, count: int, eps: float):
    """partials [B, NB, 2, C] f32 -> per-channel (mean, rstd) [B, 1, C]
    (the unit middle axis keeps the Mosaic block-shape rule happy: last
    two dims of the stats block equal the array dims)."""
    b, _, _, c = partials.shape
    cg = c // groups
    s = partials.sum(axis=1)                       # [B, 2, C]
    g = s.reshape(b, 2, groups, cg).sum(axis=-1)   # [B, 2, G]
    mean_g = g[:, 0] / count
    var_g = g[:, 1] / count - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean = jnp.repeat(mean_g, cg, axis=-1)         # [B, C]
    rstd = jnp.repeat(rstd_g, cg, axis=-1)
    return mean[:, None], rstd[:, None]


def _input_stats(x, groups: int, eps: float):
    """Stage-1 stats straight from x [B, F, HW, C] (flax GN f32 form).
    Returns per-channel (mean, rstd) as [B, 1, C]."""
    b, f, hw, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(b, f * hw, groups, cg)
    mean_g = xf.mean(axis=(1, 3))
    var_g = (xf * xf).mean(axis=(1, 3)) - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    return (jnp.repeat(mean_g, cg, axis=-1)[:, None],
            jnp.repeat(rstd_g, cg, axis=-1)[:, None])


def _stage_params(p, name, dtype):
    gn = p[f"{name}_norm"]["norm"]
    cv = p[f"{name}_conv"]
    k = cv["kernel"]  # flax Conv kernel [3, 1, 1, C, C]
    w = k.reshape(3, k.shape[-2], k.shape[-1]).astype(dtype)
    row2 = lambda a: a.reshape(1, -1)
    return (row2(gn["scale"]).astype(jnp.float32),
            row2(gn["bias"]).astype(jnp.float32),
            w[0], w[1], w[2], row2(cv["bias"]).astype(jnp.float32))


def fused_temporal_conv_chain(x, p, *, num_groups: int = 32,
                              eps: float = 1e-5, interpret: bool = False):
    """Run the whole TemporalConvBlock (4 stages + identity residual)
    via fused kernels. x: [B, F, H, W, C] bf16; ``p`` is the
    TemporalConvBlock param subtree (conv{1..4}_norm / conv{1..4}_conv).
    Returns the same shape/dtype."""
    b, f, h, w_, c = x.shape
    hw = h * w_
    tile = _hw_tile(hw, f, c)
    assert tile is not None, "fusable() must gate this call"
    nb = hw // tile
    xs = x.reshape(b, f, hw, c)
    identity = xs

    grid = (b, nb)
    xspec = pl.BlockSpec((1, f, tile, c), lambda i, j: (i, 0, j, 0))
    sspec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))  # per-b stats
    cspec1 = pl.BlockSpec((1, c), lambda i, j: (0, 0))  # shared [1, C]
    cspec2 = pl.BlockSpec((c, c), lambda i, j: (0, 0))  # shared [C, C]
    wspecs = [cspec1, cspec1, cspec2, cspec2, cspec2, cspec1]
    tokens = f * tile
    flops = grid[0] * grid[1] * 3 * 2 * tokens * c * c
    common = dict(
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )

    mean, rstd = _input_stats(xs, num_groups, eps)
    count = f * hw * (c // num_groups)
    for stage in ("conv1", "conv2", "conv3"):
        weights = _stage_params(p, stage, x.dtype)
        xs, partials = pl.pallas_call(
            _stage_kernel,
            in_specs=[xspec, sspec, sspec] + wspecs,
            out_specs=[xspec,
                       pl.BlockSpec((1, 1, 2, c), lambda i, j: (i, j, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct(xs.shape, xs.dtype),
                       jax.ShapeDtypeStruct((b, nb, 2, c), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=2 * xs.size * xs.dtype.itemsize,
                transcendentals=xs.size),
            **common,
        )(xs, mean, rstd, *weights)
        mean, rstd = _finalize_stats(partials, num_groups, count, eps)

    weights = _stage_params(p, "conv4", x.dtype)
    out = pl.pallas_call(
        _last_stage_kernel,
        in_specs=[xspec, xspec, sspec, sspec] + wspecs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(xs.shape, xs.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * xs.size * xs.dtype.itemsize,
            transcendentals=xs.size),
        **common,
    )(xs, identity, mean, rstd, *weights)
    return out.reshape(b, f, h, w_, c)
