"""DreamVideo adapters: bottleneck Adapter + adapterized transformer blocks.

TPU-native re-implementation of the reference adapter machinery
(reference: tools/modules/unet/util.py — Adapter :499-520,
BasicTransformerBlockWithAdapter :603-672, SpatialTransformerWithAdapter
:376-445, TemporalTransformerWithAdapter :1289-1394). Adapters are
down-GELU-up bottlenecks with zero-init up projection, inserted parallel
or serial to self-attn / cross-attn / feedforward, optionally conditioned
on a CLIP image feature via a learned projection.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import (CrossAttention, FeedForward, GroupNorm32, zeros_init)

Dtype = Any


class Adapter(nn.Module):
    """Bottleneck adapter (reference util.py:499-520)."""
    hidden_dim: int
    condition_dim: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, condition=None, condition_lam: float = 1.0):
        x_in = x
        if self.condition_dim is not None and condition is not None:
            cond = nn.Dense(x.shape[-1], dtype=self.dtype,
                            name="condition_linear")(condition)
            x = x + condition_lam * cond
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="down_linear")(x)
        h = nn.gelu(h)
        h = nn.Dense(x_in.shape[-1], kernel_init=zeros_init,
                     bias_init=zeros_init, dtype=self.dtype,
                     name="up_linear")(h)
        return x_in + h


class BasicTransformerBlockWithAdapter(nn.Module):
    """BasicTransformerBlock + optional adapters at each sublayer
    (reference util.py:603-672)."""
    heads: int
    dim_head: int
    dropout: float = 0.0
    disable_self_attn: bool = False
    adapter_list: Tuple[str, ...] = ()
    adapter_position_list: Tuple[str, ...] = ("parallel", "parallel", "parallel")
    adapter_hidden_dim: Optional[int] = None
    adapter_condition_dim: Optional[int] = None
    deterministic: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context=None, adapter_condition=None,
                 adapter_condition_lam: float = 1.0):
        det = self.deterministic
        dim = x.shape[-1]
        hidden = self.adapter_hidden_dim or dim // 2

        def adapter(name):
            return Adapter(hidden, self.adapter_condition_dim,
                           dtype=self.dtype, name=name)

        def sublayer(x, out, which, idx, adapter_name):
            if which in self.adapter_list:
                if self.adapter_position_list[idx] == "parallel":
                    return out + adapter(adapter_name)(
                        x, adapter_condition, adapter_condition_lam)
                return adapter(adapter_name)(
                    out + x, adapter_condition, adapter_condition_lam)
            return out + x

        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        attn1 = CrossAttention(self.heads, self.dim_head, self.dropout,
                               deterministic=det, dtype=self.dtype,
                               name="attn1")(
            h, context=context if self.disable_self_attn else None)
        x = sublayer(x, attn1, "self_attention", 0, "attn_adapter")

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        attn2 = CrossAttention(self.heads, self.dim_head, self.dropout,
                               deterministic=det, dtype=self.dtype,
                               name="attn2")(h, context=context)
        x = sublayer(x, attn2, "cross_attention", 1, "cross_attn_adapter")

        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        ff = FeedForward(dropout=self.dropout, deterministic=det,
                         dtype=self.dtype, name="ff")(h)
        x = sublayer(x, ff, "feedforward", 2, "ff_adapter")
        return x


class SpatialTransformerWithAdapter(nn.Module):
    """SpatialTransformer whose inner blocks carry adapters
    (reference util.py:376-445). Input [N, H, W, C]."""
    heads: int
    dim_head: int
    depth: int = 1
    dropout: float = 0.0
    disable_self_attn: bool = False
    adapter_list: Tuple[str, ...] = ()
    adapter_position_list: Tuple[str, ...] = ("parallel", "parallel", "parallel")
    adapter_hidden_dim: Optional[int] = None
    adapter_condition_dim: Optional[int] = None
    deterministic: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context=None, adapter_condition=None,
                 adapter_condition_lam: float = 1.0):
        n, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = GroupNorm32(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = x.reshape(n, h * w, c)
        x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        for d in range(self.depth):
            x = BasicTransformerBlockWithAdapter(
                self.heads, self.dim_head, self.dropout,
                disable_self_attn=self.disable_self_attn,
                adapter_list=tuple(self.adapter_list),
                adapter_position_list=tuple(self.adapter_position_list),
                adapter_hidden_dim=self.adapter_hidden_dim,
                adapter_condition_dim=self.adapter_condition_dim,
                deterministic=self.deterministic, dtype=self.dtype,
                name=f"block_{d}")(x, context, adapter_condition,
                                   adapter_condition_lam)
        x = nn.Dense(c, kernel_init=zeros_init, bias_init=zeros_init,
                     dtype=self.dtype, name="proj_out")(x)
        return x.reshape(n, h, w, c) + x_in


class TemporalTransformerWithAdapter(nn.Module):
    """TemporalTransformer whose inner blocks carry adapters; the
    adapter condition (CLIP image feature) is broadcast per (pixel, frame)
    token (reference util.py:1289-1394). Input [B, F, H, W, C]."""
    heads: int
    dim_head: int
    depth: int = 1
    dropout: float = 0.0
    multiply_zero: bool = False
    adapter_list: Tuple[str, ...] = ()
    adapter_position_list: Tuple[str, ...] = ("parallel", "parallel", "parallel")
    adapter_hidden_dim: Optional[int] = None
    adapter_condition_dim: Optional[int] = None
    deterministic: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, adapter_condition=None,
                 adapter_condition_lam: float = 1.0):
        b, f, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = GroupNorm32(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        cond = None
        if adapter_condition is not None:
            # [b, cond_dim] -> per (b h w) token sequence [bhw, f, cond_dim]
            cond = jnp.broadcast_to(
                adapter_condition[:, None, None, None, :],
                (b, h, w, f, adapter_condition.shape[-1]))
            cond = cond.reshape(b * h * w, f, -1)
        for d in range(self.depth):
            x = BasicTransformerBlockWithAdapter(
                self.heads, self.dim_head, self.dropout,
                adapter_list=tuple(self.adapter_list),
                adapter_position_list=tuple(self.adapter_position_list),
                adapter_hidden_dim=self.adapter_hidden_dim,
                adapter_condition_dim=self.adapter_condition_dim,
                deterministic=self.deterministic, dtype=self.dtype,
                name=f"block_{d}")(x, None, cond, adapter_condition_lam)
        x = nn.Dense(c, kernel_init=zeros_init, bias_init=zeros_init,
                     dtype=self.dtype, name="proj_out")(x)
        x = x.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        if self.multiply_zero:
            return x_in + 0.0 * x
        return x_in + x
