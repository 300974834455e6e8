"""Fused TemporalTransformer inner block — one Pallas kernel per tile.

The temporal transformer (models/blocks.py TemporalTransformer; reference
tools/modules/unet/util.py:1189-1286) runs at ~38 TF/s on the XLA path
(tools_dev/profile_tt_parts.py): the activation [(b h w), f, c] makes a
round trip to HBM between every LN / q/k/v projection / tiny attention /
out projection / GEGLU matmul — ~12 passes of a ~37 MB tensor at c320 —
and the S=16 attention pads its scores to (8,128) tiles on both sides of
the softmax.

Everything from LN1 to proj_out is row-parallel (LayerNorm stats are
per-token, attention mixes only the f frames of one pixel), so the whole
inner block fuses into ONE kernel over row tiles:

  * all weight matrices live in VMEM for the whole grid (constant
    index_map -> fetched once);
  * the tile [T, C] of tokens stays in VMEM across LN1 -> attn1 -> LN2 ->
    attn2 -> LN3 -> GEGLU FF -> proj_out: one HBM read + one write;
  * attention uses the packed band trick from ops/attention.py: 128
    consecutive token rows hold 128//f items, scores are a dense
    [128, 128] MXU tile masked to the block-diagonal f-band;
  * the GEGLU intermediate ([T, 8C] — 10+ MB at full width) is column-
    chunked: h/gate chunk pairs are produced, gated, and immediately
    contracted into an f32 accumulator, so only [T, CHUNK] slices are
    ever live.

Weight budget (bf16): C=320 -> 4.2 MB, C=512 -> 10.8 MB (fits VMEM:
mega-kernel). C=640 -> 17 MB (doesn't fit: the block splits into a fused
LN+attention kernel and a fused LN+GEGLU-FF kernel, still 6 HBM passes
instead of ~12). C=1280 carries few tokens (b*h*w <= 224) and stays on
XLA.

Numerics match the flax path: LN stats in f32 (eps 1e-6), matmuls bf16 x
bf16 with f32 accumulation cast back to bf16 (XLA's bf16 dot semantics),
softmax in f32, tanh-approximate GELU. Inference-only (the training path
keeps the flax modules: dropout + custom_vjp attention).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _mm(a, b):
    """bf16 x bf16 matmul, f32 accumulation (XLA bf16-dot semantics)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_t(a, b):
    """a @ b.T with f32 accumulation."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _layernorm(x, scale, bias, eps: float = 1e-6):
    """Per-row LayerNorm, stats in f32 (flax nn.LayerNorm semantics).
    x [T, C]; scale/bias [1, C]. Returns x.dtype."""
    xf = x.astype(jnp.float32)
    m = xf.mean(axis=-1, keepdims=True)
    var = (xf * xf).mean(axis=-1, keepdims=True) - m * m
    y = (xf - m) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _band_mask(f: int):
    """[128, 128] bool: True inside the block-diagonal f-band."""
    r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) // f
    c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) // f
    return r == c


def _band_attention(h, wq, wk, wv, o_scr, *, heads: int, dh: int, f: int):
    """Self-attention over f-frame bands. h [T, C] (T % 128 == 0,
    C = heads*dh); q/k/v projected in full [T, C] matmuls, scores per
    (128-row group, head) as dense [128, 128] MXU tiles masked to the
    band. Writes the attention output into o_scr [T, C]."""
    t = h.shape[0]
    q = _mm(h, wq).astype(h.dtype)
    k = _mm(h, wk).astype(h.dtype)
    v = _mm(h, wv).astype(h.dtype)
    scale = 1.0 / math.sqrt(dh)
    band = _band_mask(f)
    for g in range(t // 128):
        rs = slice(g * 128, (g + 1) * 128)
        qg, kg, vg = q[rs], k[rs], v[rs]
        for hh in range(heads):
            cs = slice(hh * dh, (hh + 1) * dh)
            s = _mm_t(qg[:, cs], kg[:, cs]) * scale
            s = jnp.where(band, s, _NEG_INF)
            m = s.max(axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / p.sum(axis=-1, keepdims=True)
            o = _mm(p.astype(vg.dtype), vg[:, cs])
            o_scr[rs, cs] = o.astype(o_scr.dtype)


def _geglu_ff(h, w1, b1, w2, b2, *, chunk: int):
    """GEGLU feed-forward with column-chunked intermediate.
    h [T, C]; w1 [C, 2*Cf] (h columns then gate columns, flax GEGLU
    split order); w2 [Cf, C]. Returns [T, C] f32 (bias-added)."""
    cf = w1.shape[1] // 2
    acc = None
    for j in range(cf // chunk):
        hs = slice(j * chunk, (j + 1) * chunk)
        gs = slice(cf + j * chunk, cf + (j + 1) * chunk)
        a = (_mm(h, w1[:, hs]) + b1[:, hs].astype(jnp.float32)).astype(h.dtype)
        g = (_mm(h, w1[:, gs]) + b1[:, gs].astype(jnp.float32)).astype(h.dtype)
        part = _mm((a * jax.nn.gelu(g, approximate=True)).astype(h.dtype),
                   w2[hs, :])
        acc = part if acc is None else acc + part
    return acc + b2.astype(jnp.float32)


# --------------------------------------------------------------------- #
# mega-kernel: whole inner block (C <= ~512)
# --------------------------------------------------------------------- #
def _block_kernel(x_ref, ln1_s, ln1_b, wq1, wk1, wv1, wo1, bo1,
                  ln2_s, ln2_b, wq2, wk2, wv2, wo2, bo2,
                  ln3_s, ln3_b, w1, b1, w2, b2, wpo, bpo,
                  out_ref, o_scr, *, heads: int, dh: int, f: int,
                  ff_chunk: int):
    r, f_, c = x_ref.shape
    t = r * f_
    xt = x_ref[...].reshape(t, c)

    h = _layernorm(xt, ln1_s[...], ln1_b[...])
    _band_attention(h, wq1[...], wk1[...], wv1[...], o_scr,
                    heads=heads, dh=dh, f=f)
    xt = xt + (_mm(o_scr[...], wo1[...])
               + bo1[...].astype(jnp.float32)).astype(xt.dtype)

    h = _layernorm(xt, ln2_s[...], ln2_b[...])
    _band_attention(h, wq2[...], wk2[...], wv2[...], o_scr,
                    heads=heads, dh=dh, f=f)
    xt = xt + (_mm(o_scr[...], wo2[...])
               + bo2[...].astype(jnp.float32)).astype(xt.dtype)

    h = _layernorm(xt, ln3_s[...], ln3_b[...])
    xt = xt + _geglu_ff(h, w1[...], b1[...], w2[...], b2[...],
                        chunk=ff_chunk).astype(xt.dtype)

    out = _mm(xt, wpo[...]) + bpo[...].astype(jnp.float32)
    out_ref[...] = out.astype(out_ref.dtype).reshape(r, f_, wpo.shape[1])


def fused_tt_block(x, p, *, heads: int, dim_head: int,
                   tokens_per_block: Optional[int] = None,
                   interpret: bool = False):
    """x: [BHW, F, C] (C = heads*dim_head, 128 % F == 0). ``p`` is the
    TemporalTransformer param subtree: p['block_0'][...] flax names +
    p['proj_out']. Returns [BHW, F, c_out]."""
    bhw, f, c = x.shape
    blk = p["block_0"]
    wpo = p["proj_out"]["kernel"]
    c_out = wpo.shape[1]

    if tokens_per_block is None:
        # measured VMEM (Mosaic scoped-alloc): c320 @ 2048 tokens = 20.4 MB
        # (over the 16 MB limit); 1024 tokens fits with room for the
        # compiler's double-buffering of the x/out tiles
        tokens_per_block = 1024 if c <= 384 else 512
    rows_pb = max(tokens_per_block // f, 128 // f)
    pad = _ceil_to(bhw, rows_pb) - bhw
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    grid = (x.shape[0] // rows_pb,)

    ff_w1 = blk["ff"]["geglu"]["proj"]["kernel"]
    cf = ff_w1.shape[1] // 2
    ff_chunk = 256 if cf % 256 == 0 else cf  # lane-aligned chunks

    row2 = lambda a: a.reshape(1, -1)  # biases/scales as (1, n) tiles
    weights = [
        row2(blk["norm1"]["scale"]), row2(blk["norm1"]["bias"]),
        blk["attn1"]["to_q"]["kernel"], blk["attn1"]["to_k"]["kernel"],
        blk["attn1"]["to_v"]["kernel"], blk["attn1"]["to_out"]["kernel"],
        row2(blk["attn1"]["to_out"]["bias"]),
        row2(blk["norm2"]["scale"]), row2(blk["norm2"]["bias"]),
        blk["attn2"]["to_q"]["kernel"], blk["attn2"]["to_k"]["kernel"],
        blk["attn2"]["to_v"]["kernel"], blk["attn2"]["to_out"]["kernel"],
        row2(blk["attn2"]["to_out"]["bias"]),
        row2(blk["norm3"]["scale"]), row2(blk["norm3"]["bias"]),
        ff_w1, row2(blk["ff"]["geglu"]["proj"]["bias"]),
        blk["ff"]["fc_out"]["kernel"], row2(blk["ff"]["fc_out"]["bias"]),
        wpo, row2(p["proj_out"]["bias"]),
    ]
    weights = [w.astype(x.dtype) for w in weights]
    wspecs = [pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n)
              for w in weights]

    kernel = functools.partial(_block_kernel, heads=heads, dh=dim_head,
                               f=f, ff_chunk=ff_chunk)
    t = rows_pb * f
    flops_pb = (2 * t * c * c * (4 * 2 + 1)  # qkv/out x2 + proj_out(~c)
                + 2 * t * c * 2 * cf + 2 * t * cf * c  # GEGLU
                + 4 * t * 128 * dim_head * heads)  # band attention
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((rows_pb, f, c), lambda i: (i, 0, 0))]
        + wspecs,
        out_specs=pl.BlockSpec((rows_pb, f, c_out), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], f, c_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((t, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=grid[0] * flops_pb,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + sum(w.size for w in weights) * x.dtype.itemsize,
            transcendentals=grid[0] * t * (128 * 2 + 2 * cf)),
        interpret=interpret,
    )(x, *weights)
    return out[:bhw]


# --------------------------------------------------------------------- #
# split kernels (C = 640): LN+attention / LN+GEGLU-FF
# --------------------------------------------------------------------- #
def _attn_kernel(x_ref, ln_s, ln_b, wq, wk, wv, wo, bo, out_ref, o_scr,
                 *, heads: int, dh: int, f: int):
    r, f_, c = x_ref.shape
    t = r * f_
    xt = x_ref[...].reshape(t, c)
    h = _layernorm(xt, ln_s[...], ln_b[...])
    _band_attention(h, wq[...], wk[...], wv[...], o_scr,
                    heads=heads, dh=dh, f=f)
    out = xt + (_mm(o_scr[...], wo[...])
                + bo[...].astype(jnp.float32)).astype(xt.dtype)
    out_ref[...] = out.reshape(r, f_, c)


def fused_ln_attn(x, ln, attn, *, heads: int, dim_head: int,
                  tokens_per_block: int = 512, interpret: bool = False):
    """x + to_out(attention(LN(x))): one kernel. x [BHW, F, C].

    tokens_per_block=512: at C=640 (the only split-path width) the
    kernel's scoped-VMEM stack is ~19.5 MB with 1024 tokens — over the
    16 MB per-core scoped limit, which aborts the compile ("Ran out of
    memory in memory space vmem ... on stack"). 512 tokens fit with
    margin; measured on v5e across BHW 896..14080."""
    bhw, f, c = x.shape
    rows_pb = max(tokens_per_block // f, 128 // f)
    pad = _ceil_to(bhw, rows_pb) - bhw
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    row2 = lambda a: a.reshape(1, -1)
    weights = [row2(ln["scale"]), row2(ln["bias"]),
               attn["to_q"]["kernel"], attn["to_k"]["kernel"],
               attn["to_v"]["kernel"], attn["to_out"]["kernel"],
               row2(attn["to_out"]["bias"])]
    weights = [w.astype(x.dtype) for w in weights]
    wspecs = [pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n)
              for w in weights]
    t = rows_pb * f
    kernel = functools.partial(_attn_kernel, heads=heads, dh=dim_head, f=f)
    out = pl.pallas_call(
        kernel,
        grid=(x.shape[0] // rows_pb,),
        in_specs=[pl.BlockSpec((rows_pb, f, c), lambda i: (i, 0, 0))]
        + wspecs,
        out_specs=pl.BlockSpec((rows_pb, f, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((t, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=(x.shape[0] // rows_pb)
            * (8 * t * c * c + 4 * t * 128 * c),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=(x.shape[0] // rows_pb) * t * 128),
        interpret=interpret,
    )(x, *weights)
    return out[:bhw]


def _ff_kernel(x_ref, ln_s, ln_b, w1, b1, w2, b2, out_ref, *,
               ff_chunk: int):
    r, f_, c = x_ref.shape
    t = r * f_
    xt = x_ref[...].reshape(t, c)
    h = _layernorm(xt, ln_s[...], ln_b[...])
    out = xt + _geglu_ff(h, w1[...], b1[...], w2[...], b2[...],
                         chunk=ff_chunk).astype(xt.dtype)
    out_ref[...] = out.reshape(r, f_, c)


def fused_ln_ff(x, ln, ff, *, tokens_per_block: int = 512,
                interpret: bool = False):
    """x + GEGLU_FF(LN(x)): one kernel, column-chunked intermediate."""
    bhw, f, c = x.shape
    rows_pb = max(tokens_per_block // f, 128 // f)
    pad = _ceil_to(bhw, rows_pb) - bhw
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    row2 = lambda a: a.reshape(1, -1)
    w1 = ff["geglu"]["proj"]["kernel"]
    cf = w1.shape[1] // 2
    ff_chunk = 256 if cf % 256 == 0 else cf
    weights = [row2(ln["scale"]), row2(ln["bias"]),
               w1, row2(ff["geglu"]["proj"]["bias"]),
               ff["fc_out"]["kernel"], row2(ff["fc_out"]["bias"])]
    weights = [w.astype(x.dtype) for w in weights]
    wspecs = [pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n)
              for w in weights]
    t = rows_pb * f
    kernel = functools.partial(_ff_kernel, ff_chunk=ff_chunk)
    out = pl.pallas_call(
        kernel,
        grid=(x.shape[0] // rows_pb,),
        in_specs=[pl.BlockSpec((rows_pb, f, c), lambda i: (i, 0, 0))]
        + wspecs,
        out_specs=pl.BlockSpec((rows_pb, f, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=(x.shape[0] // rows_pb) * (2 * t * c * 2 * cf
                                             + 2 * t * cf * c),
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + sum(w.size for w in weights) * x.dtype.itemsize,
            transcendentals=(x.shape[0] // rows_pb) * t * cf),
        interpret=interpret,
    )(x, *weights)
    return out[:bhw]


# --------------------------------------------------------------------- #
# dispatch
# --------------------------------------------------------------------- #
# VMEM weight budget: the mega-kernel holds every matrix of the block
# (10.8 MB bf16 at C=512); the split path holds one attention (3.3 MB at
# C=640) or one FF (9.8 MB). Above that (C=1280: 13-39 MB) -> no fusion.
MEGA_MAX_C = 512
SPLIT_MAX_C = 640


def fusable(f: int, c: int, heads: int, dim_head: int, dtype) -> bool:
    """Static dispatch: can the fused path run this shape?

    dim_head is pinned to 64 — the only value in the shipped model zoo
    and the only one validated on-chip (tests/test_fused_tt_tpu.py /
    tools_dev/check_fused_tt_onchip.py); an unusual head size would hit
    an untested Mosaic lowering at runtime (ADVICE r4)."""
    return (f >= 1 and 128 % f == 0 and c == heads * dim_head
            and dim_head == 64
            and c <= SPLIT_MAX_C and dtype == jnp.bfloat16)


def fused_tt_inner(x, p, *, heads: int, dim_head: int,
                   interpret: bool = False):
    """Run the whole TemporalTransformer inner (block_0 + proj_out) via
    the fused kernels. x [BHW, F, C]; p the TT param subtree."""
    c = x.shape[-1]
    if c <= MEGA_MAX_C:
        return fused_tt_block(x, p, heads=heads, dim_head=dim_head,
                              interpret=interpret)
    blk = p["block_0"]
    x = fused_ln_attn(x, blk["norm1"], blk["attn1"], heads=heads,
                      dim_head=dim_head, interpret=interpret)
    x = fused_ln_attn(x, blk["norm2"], blk["attn2"], heads=heads,
                      dim_head=dim_head, interpret=interpret)
    x = fused_ln_ff(x, blk["norm3"], blk["ff"], interpret=interpret)
    wpo = p["proj_out"]["kernel"].astype(x.dtype)
    bpo = p["proj_out"]["bias"]
    return (jax.lax.dot_general(
        x, wpo, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bpo.astype(jnp.float32)).astype(x.dtype)
