"""Legacy block variants (the USE_TEMPORAL_TRANSFORMER=False path).

TPU-native re-implementation of the reference's legacy blocks
(reference: tools/modules/unet/util.py): RelativePositionBias :271-309,
TemporalAttentionBlock :1068-1187, TemporalAttentionMultiBlock
:1455-1581, masked attention variants :522-601 + TemporalTransformer_attemask
:1455+, InitTemporalConvBlock/TemporalConvBlock(v1) :1583-1650,
ResidualBlock/AttentionBlock :972-1065, and the vestigial
FlashAttentionBlock (mha_flash.py:12-81 — superseded by ops.attention).

No shipped config enables this path (the shipped models all use
TemporalTransformer); these exist for reference-inventory completeness
and for loading older checkpoints.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention
from .blocks import GroupNorm32, zeros_init

Dtype = Any


def rotary_embedding(seq_len: int, dim: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotary cos/sin tables in the rotary-embedding-torch==0.2.1
    convention the reference depends on (requirements.txt:20): each
    frequency is repeated INTERLEAVED ([f0,f0,f1,f1,...]), not
    half-split — parity-tested in tests/test_parity_blocks_legacy.py."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)           # [n, dim/2]
    emb = jnp.repeat(freqs, 2, axis=-1)      # [n, dim] interleaved
    return jnp.cos(emb), jnp.sin(emb)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x: [..., seq, >=dim_rot]; interleaved-pair rotation
    (rotary_embedding_torch.rotate_half: (x0,x1) -> (-x1,x0))."""
    d = cos.shape[-1]
    x_rot, x_pass = x[..., :d], x[..., d:]
    x1, x2 = x_rot[..., 0::2], x_rot[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(x_rot.shape)
    return jnp.concatenate([x_rot * cos + rotated * sin, x_pass], axis=-1)


class RelativePositionBias(nn.Module):
    """T5-style bucketed temporal bias (reference util.py:271-309)."""
    heads: int = 8
    num_buckets: int = 32
    max_distance: int = 128

    @staticmethod
    def _bucket(rel_pos, num_buckets=32, max_distance=128):
        ret = 0
        n = -rel_pos
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
        max_exact = num_buckets // 2
        is_small = n < max_exact
        val_large = max_exact + (
            jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
            / math.log(max_distance / max_exact)
            * (num_buckets - max_exact)).astype(jnp.int32)
        val_large = jnp.minimum(val_large, num_buckets - 1)
        return ret + jnp.where(is_small, n, val_large)

    @nn.compact
    def __call__(self, n: int):
        q_pos = jnp.arange(n)
        rel = q_pos[None, :] - q_pos[:, None]
        buckets = self._bucket(rel, self.num_buckets, self.max_distance)
        table = nn.Embed(self.num_buckets, self.heads,
                         name="relative_attention_bias")(buckets)
        return table.transpose(2, 0, 1)  # [heads, n, n]


class TemporalAttentionBlock(nn.Module):
    """Rotary-embedding temporal self-attention with focus-present /
    video-mask support (reference util.py:1068-1187). Input
    [b, f, h, w, c]; bias [heads, f, f] optional."""
    heads: int = 8
    dim_head: int = 64
    use_sim_mask: bool = False
    use_image_dataset: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, pos_bias=None, focus_present_mask=None,
                 video_mask=None):
        b, f, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        xn = GroupNorm32(dtype=self.dtype, name="norm")(x)
        tokens = xn.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        # reference to_qkv/to_out carry biases and to_out is NOT zero-init
        # (util.py:1091-1096: both commented out) — kernel init kept zero
        # here as our fresh-init convention; irrelevant once weights load
        qkv = nn.Dense(inner * 3, dtype=self.dtype, name="to_qkv")(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        n, s = q.shape[0], q.shape[1]
        q = q.reshape(n, s, self.heads, self.dim_head)
        k = k.reshape(n, s, self.heads, self.dim_head)
        v = v.reshape(n, s, self.heads, self.dim_head)
        rot_dim = min(32, self.dim_head)
        cos, sin = rotary_embedding(f, rot_dim)
        q = apply_rotary(q.transpose(0, 2, 1, 3), cos, sin).transpose(0, 2, 1, 3)
        k = apply_rotary(k.transpose(0, 2, 1, 3), cos, sin).transpose(0, 2, 1, 3)

        bias = jnp.zeros((self.heads, f, f), jnp.float32)
        if pos_bias is not None:
            bias = bias + pos_bias
        if video_mask is not None and focus_present_mask is None:
            # reference masks rows AND columns (util.py:1152-1155:
            # video_mask[:,None,:] * video_mask[:,:,None]) and only when
            # no focus mask is given (elif at :1156)
            vm = video_mask[:, None, :] & video_mask[:, :, None]  # [b,f,f]
            vm = jnp.where(vm, 0.0, -1e9)
            vm = jnp.repeat(vm, h * w, axis=0)  # rows of each sample
            bias = bias[None] + vm[:, None]
        if self.use_sim_mask:
            # causal similarity mask (util.py:1166-1168)
            sm = jnp.where(jnp.tril(jnp.ones((f, f), bool)), 0.0, -1e9)
            bias = bias + sm
        o = attention(q, k, v, bias=bias)
        if focus_present_mask is not None:
            # arrested attention across time: attend-self == pass v
            # through (util.py:1113-1120, 1156-1165)
            fp = jnp.repeat(focus_present_mask, h * w, axis=0)
            o = jnp.where(fp[:, None, None, None], v, o)
        o = o.reshape(n, s, inner)
        o = nn.Dense(c, kernel_init=zeros_init, bias_init=zeros_init,
                     dtype=self.dtype, name="to_out")(o)
        o = o.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        if self.use_image_dataset:
            return x_in + 0.0 * o
        return x_in + o


class TemporalAttentionMultiBlock(nn.Module):
    """N stacked TemporalAttentionBlocks (reference util.py:1455-1581)."""
    heads: int = 8
    dim_head: int = 64
    temporal_attn_times: int = 1
    use_sim_mask: bool = False
    use_image_dataset: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, pos_bias=None, focus_present_mask=None,
                 video_mask=None):
        for i in range(self.temporal_attn_times):
            x = TemporalAttentionBlock(
                self.heads, self.dim_head, self.use_sim_mask,
                self.use_image_dataset, dtype=self.dtype,
                name=f"attn_{i}")(x, pos_bias, focus_present_mask, video_mask)
        return x


class CrossAttentionMasked(nn.Module):
    """Attention variant accepting an additive mask (the reference's
    MemoryEfficientCrossAttention_attemask, util.py:522-601)."""
    heads: int = 8
    dim_head: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        b, sq, sk = q.shape[0], q.shape[1], k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, sk, self.heads, self.dim_head)
        v = v.reshape(b, sk, self.heads, self.dim_head)
        o = attention(q, k, v, bias=mask).reshape(b, sq, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(o)


class InitTemporalConvBlock(nn.Module):
    """Single zero-init temporal conv with identity residual
    (reference util.py:1583-1610). Input [b, f, h, w, c]."""
    dropout: float = 0.0
    use_image_dataset: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        identity = x
        h = GroupNorm32(dtype=self.dtype, name="norm")(x)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(x.shape[-1], (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    kernel_init=zeros_init, bias_init=zeros_init,
                    dtype=self.dtype, name="conv")(h)
        if self.use_image_dataset:
            return identity + 0.0 * h
        return identity + h


class TemporalConvBlockV1(nn.Module):
    """Two-conv temporal block (reference TemporalConvBlock,
    util.py:1612-1650). Input [b, f, h, w, c]."""
    out_channels: Optional[int] = None
    dropout: float = 0.0
    use_image_dataset: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        identity = x
        c_out = self.out_channels or x.shape[-1]
        h = GroupNorm32(dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(c_out, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(x.shape[-1], (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    kernel_init=zeros_init, bias_init=zeros_init,
                    dtype=self.dtype, name="conv2")(h)
        if self.use_image_dataset:
            return identity + 0.0 * h
        return identity + h


class ResidualBlock(nn.Module):
    """Legacy composer-style residual block (reference util.py:972-1028)."""
    out_channels: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        h = GroupNorm32(dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        e = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="emb_proj")(nn.silu(emb))
        h = h + e[:, None, None, :]
        h = GroupNorm32(dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=zeros_init, bias_init=zeros_init,
                    dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Legacy single-head-per-channel-group spatial attention
    (reference util.py:1030-1065). Input [n, h, w, c]."""
    heads: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        xn = GroupNorm32(dtype=self.dtype, name="norm")(x)
        qkv = nn.Conv(c * 3, (1, 1), dtype=self.dtype, name="to_qkv")(xn)
        q, k, v = jnp.split(qkv.reshape(n, h * w, 3 * c), 3, axis=-1)
        d = c // self.heads
        q = q.reshape(n, h * w, self.heads, d)
        k = k.reshape(n, h * w, self.heads, d)
        v = v.reshape(n, h * w, self.heads, d)
        o = attention(q, k, v).reshape(n, h, w, c)
        o = nn.Conv(c, (1, 1), kernel_init=zeros_init, bias_init=zeros_init,
                    dtype=self.dtype, name="proj")(o)
        return x + o
