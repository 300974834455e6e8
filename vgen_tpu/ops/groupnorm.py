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
