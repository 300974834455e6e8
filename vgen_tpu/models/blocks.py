"""Shared UNet block library (flax.linen, NHWC, bf16-ready).

TPU-native re-implementation of the reference block zoo
(reference: tools/modules/unet/util.py, 1741 LoC). Same computational
graph, different architecture:

  * Layout: spatial tensors are [N, H, W, C] (N = batch*frames), video
    tensors [B, F, H, W, C] — channels-last is the native TPU layout and
    removes the reference's permanent NCHW<->tokens rearranging.
  * All attention rides vgen_tpu.ops.attention (Pallas flash kernel /
    fused dense), replacing xformers (reference util.py:213-269). No
    max_bs=4096 batch chunking — that works around a CUDA kernel limit.
  * Activation recompute is jax.checkpoint (nn.remat) at the block level,
    replacing fairscale/torch checkpoint wrappers.
  * Dropout is explicit (deterministic flag + rng), train-only.

Weight-compatibility: module/param naming is chosen so a PyTorch
checkpoint maps by a mechanical key translation (see utils/ckpt.py).
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention
from jax.ad_checkpoint import checkpoint_name

Dtype = Any

zeros_init = nn.initializers.zeros
default_kernel = nn.initializers.lecun_normal()

# Layout-flip knobs (tools_dev/profile_layout_flip.py). XLA's layout
# assignment is globally coupled (GroupNorm32 docstring below): conv ops
# pull activations batch-minor, which both slows XLA's own GN stats
# fusions (42 ms of a 190 ms UNet fwd at 15-90 GB/s) and blocks the
# full-bandwidth Pallas stats kernels (relayout copies around the
# custom-call). CONV_IMPL="matmul" re-expresses the 3x3 / (3,1,1) convs
# as shifted matmuls (identical param pytrees, so checkpoints are
# interchangeable); GN_IMPL="stats" routes GroupNorm32 through the
# Pallas stats+apply pair (ops/groupnorm.py). Studies mutate these
# module globals between jits; env vars set process-wide defaults.
# MEASURED (profile_layout_flip.py, TPU v5 lite): both flips LOSE —
# xla+flax 191.9 ms/fwd vs matmul+flax 200.0, xla+stats 204.0,
# matmul+stats 233.4. Defaults stay "xla"/"flax"; the alternates remain
# as tested, checkpoint-compatible formulations for future hardware.
CONV_IMPL = os.environ.get("VGEN_CONV_IMPL", "xla")
# "named" (default, r5): flax-identical GN math with checkpoint_name-
# tagged stats so remat policies can save them; "flax": nn.GroupNorm;
# "stats": the (measured-slower) Pallas stats kernel.
GN_IMPL = os.environ.get("VGEN_GN_IMPL", "named")
# Fused TemporalTransformer inner kernel (ops/fused_tt.py): "auto" (on
# TPU, inference-only shapes), "off", or "interpret" (CPU tests force the
# Pallas interpreter). The fused path reads the SAME param tree the flax
# modules create (init always runs unfused), so checkpoints/importer are
# oblivious to it.
FUSED_TT = os.environ.get("VGEN_FUSED_TT", "auto")
# Fused TemporalConvBlock chain (ops/fused_tconv.py): same tri-state and
# the same init/checkpoint obliviousness as FUSED_TT.
FUSED_TCONV = os.environ.get("VGEN_FUSED_TCONV", "auto")


def set_fused_tt(mode=None):
    """Set the fused-kernel dispatch mode (BOTH the TemporalTransformer
    and TemporalConvBlock kernels) for this process; ``None`` restores
    the env defaults. Train engines call ``set_fused_tt("off")`` at
    worker entry so every model in a training step (e.g. the VideoLCM
    student / frozen teacher / EMA target trio, where teacher+target run
    with deterministic=True) shares ONE numeric path — the fused kernels
    are validated for inference, not for loss landscapes that compare two
    paths (ADVICE r4). Infer engines reset to the env default. The flag
    is read at TRACE time, so it must be set before the first jit call."""
    global FUSED_TT, FUSED_TCONV
    FUSED_TT = os.environ.get("VGEN_FUSED_TT", "auto") if mode is None \
        else mode
    FUSED_TCONV = os.environ.get("VGEN_FUSED_TCONV", "auto") \
        if mode is None else mode
    return FUSED_TT


def sinusoidal_embedding(timesteps: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Timestep/fps embedding. NOTE the reference concatenates cos FIRST,
    then sin (reference util.py:178-190) — kept for weight compatibility."""
    half = dim // 2
    t = jnp.asarray(timesteps, jnp.float32)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = jnp.outer(t, freqs)
    x = jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=1)
    if dim % 2 != 0:
        x = jnp.concatenate([x, jnp.zeros_like(x[:, :1])], axis=1)
    return x


def prob_mask_like(key, shape, prob: float) -> jnp.ndarray:
    """Bernoulli focus-present mask; the reference clears one element when
    all are True to dodge a DDP unused-parameter error (util.py:200-210) —
    irrelevant under SPMD, so this is a plain Bernoulli draw."""
    if prob == 1:
        return jnp.ones(shape, dtype=bool)
    if prob == 0:
        return jnp.zeros(shape, dtype=bool)
    return jax.random.uniform(key, shape) < prob


class _MMConv2d3x3(nn.Module):
    """3x3 'same' conv expressed as 9 shifted matmuls.

    Param pytree is identical to ``nn.Conv(features, (3, 3))`` (kernel
    [3, 3, Cin, Cout], bias [Cout]) so checkpoints and the torch importer
    are oblivious to the formulation. Accumulates the 9 partial products
    in f32 (one dot_general per tap; XLA folds the pad+slice into the
    operand read), then casts once — numerically within bf16 rounding of
    the conv lowering, pinned by tests/test_mm_conv.py."""
    features: int
    kernel_init: Callable = default_kernel
    bias_init: Callable = zeros_init
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, cin, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        k = kernel.astype(dt)
        n, h, w, _ = x.shape
        hp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for dy in range(3):
            for dx in range(3):
                t = jax.lax.dot_general(
                    hp[:, dy:dy + h, dx:dx + w], k[dy, dx],
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out = t if out is None else out + t
        return (out + bias.astype(jnp.float32)).astype(dt)


class _MMConvT3(nn.Module):
    """(3,1,1) temporal 'same' conv as 3 frame-shifted matmuls.

    Param pytree identical to ``nn.Conv(features, (3, 1, 1))`` (kernel
    [3, 1, 1, Cin, Cout], bias [Cout]). Input [B, F, H, W, C]."""
    features: int
    kernel_init: Callable = default_kernel
    bias_init: Callable = zeros_init
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, v):
        cin = v.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 1, 1, cin, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        dt = self.dtype or v.dtype
        x = v.astype(dt)
        k = kernel.reshape(3, cin, self.features).astype(dt)
        prev = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], 1)
        nxt = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], 1)
        dot = lambda a, w: jax.lax.dot_general(  # noqa: E731
            a, w, (((4,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = dot(prev, k[0]) + dot(x, k[1]) + dot(nxt, k[2])
        return (out + bias.astype(jnp.float32)).astype(dt)


def conv3x3(features, *, kernel_init=default_kernel, bias_init=zeros_init,
            dtype=None, name=None):
    """Stride-1 'same' 3x3 conv, formulation per CONV_IMPL."""
    if CONV_IMPL == "matmul":
        return _MMConv2d3x3(features, kernel_init=kernel_init,
                            bias_init=bias_init, dtype=dtype, name=name)
    return nn.Conv(features, (3, 3), padding=1, kernel_init=kernel_init,
                   bias_init=bias_init, dtype=dtype, name=name)


def tconv3(features, *, kernel_init=default_kernel, bias_init=zeros_init,
           dtype=None, name=None):
    """(3,1,1) temporal 'same' conv, formulation per CONV_IMPL."""
    if CONV_IMPL == "matmul":
        return _MMConvT3(features, kernel_init=kernel_init,
                         bias_init=bias_init, dtype=dtype, name=name)
    return nn.Conv(features, kernel_size=(3, 1, 1),
                   padding=((1, 1), (0, 0), (0, 0)),
                   kernel_init=kernel_init, bias_init=bias_init,
                   dtype=dtype, name=name)


class _StatsGN(nn.Module):
    """GroupNorm via the Pallas stats+apply pair (ops/groupnorm.py).
    Param pytree identical to ``nn.GroupNorm`` (scale, bias)."""
    num_groups: int
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        from ..ops.groupnorm import group_norm_stats_fast
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", zeros_init, (c,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return group_norm_stats_fast(x, scale, bias, self.num_groups,
                                     self.epsilon)


class GroupNorm32(nn.Module):
    """GroupNorm(32) matching torch semantics (contiguous channel groups).

    Stays on flax nn.GroupNorm after TWO measured Pallas attempts
    (ops/groupnorm.py, tools_dev/trace_step.py):
      * fully fused GN kernel: 9.8 -> 12.1 s/video (fusion barrier);
      * stats-only kernel (+ jnp or Pallas normalize, round 3): XLA's GN
        stats fusions cost 42 ms of a 190 ms UNet forward at 15-90 GB/s
        and the Pallas stats kernel itself runs at full bandwidth
        (2.5 ms total) — but every wiring LOST end-to-end (197 -> 206-214
        ms/fwd): custom-calls force row-major operands while XLA lays
        activations out batch-minor for the convs, so each call inserts
        relayout copies and perturbs the 5D temporal-conv lowering
        (2 ms/conv standalone vs space-partitioned inside fusions).
    Lesson: on this model XLA's layout assignment is globally coupled;
    per-norm kernels can't win without also owning the convs.
    """
    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        g = min(self.num_groups, x.shape[-1])
        if GN_IMPL == "stats":
            return _StatsGN(num_groups=g, epsilon=self.epsilon,
                            dtype=self.dtype, name="norm")(x)
        if GN_IMPL == "flax":
            return nn.GroupNorm(num_groups=g, epsilon=self.epsilon,
                                dtype=self.dtype, name="norm")(x)
        return _NamedStatsGN(num_groups=g, epsilon=self.epsilon,
                             dtype=self.dtype, name="norm")(x)


class _NamedStatsGN(nn.Module):
    """GroupNorm numerically identical to flax nn.GroupNorm
    (use_fast_variance path: f32 mean / E[x^2]-E[x]^2, rsqrt(var+eps)),
    with the per-(sample, group) stats tagged via ``checkpoint_name`` so
    a remat policy can SAVE them: the r5 train trace puts 17% of step
    time in reduces — largely the backward replay recomputing GN stats —
    and saving [N, 32] f32 stats costs ~nothing (remat_policy="attn_gn",
    unet_t2v.py). Param tree matches nn.GroupNorm (scale/bias under the
    same "norm" scope)."""
    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (g, c // g))
        red = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
        mean = xf.mean(red, keepdims=True)
        var = (xf * xf).mean(red, keepdims=True) - mean * mean
        rstd = jax.lax.rsqrt(var + self.epsilon)
        mean = checkpoint_name(mean, "gn_stats")
        rstd = checkpoint_name(rstd, "gn_stats")
        y = ((xf - mean) * rstd).reshape(x.shape)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.dtype or x.dtype)


class TimestepEmbedding(nn.Module):
    """Linear-SiLU-Linear MLP over the sinusoidal embedding
    (reference unet_t2v.py:93-104). zero_init: fps variant zero-inits the
    output layer so the condition starts as a no-op."""
    embed_dim: int
    zero_init_out: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, emb):
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="fc1")(emb)
        h = nn.silu(h)
        out_init = zeros_init if self.zero_init_out else default_kernel
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2",
                        kernel_init=out_init, bias_init=zeros_init)(h)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class FeedForward(nn.Module):
    """GEGLU MLP (reference util.py:726-741)."""
    dim_out: Optional[int] = None
    mult: int = 4
    glu: bool = True
    dropout: float = 0.0
    deterministic: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = int(dim * self.mult)
        if self.glu:
            h = GEGLU(inner, dtype=self.dtype, name="geglu")(x)
        else:
            h = nn.gelu(nn.Dense(inner, dtype=self.dtype, name="fc_in")(x))
        h = nn.Dropout(self.dropout)(h, deterministic=self.deterministic)
        return nn.Dense(self.dim_out or dim, dtype=self.dtype, name="fc_out")(h)


class LoRA(nn.Module):
    """Low-rank branch: down (init std 1/rank) -> up (zero-init)
    (reference unet_lora.py:114-131)."""
    rank: int
    out_dim: int
    alpha: Optional[float] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.rank, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(1.0 / self.rank),
                     name="down_linear")(x)
        h = nn.Dense(self.out_dim, use_bias=False, kernel_init=zeros_init,
                     dtype=self.dtype, name="up_linear")(h)
        if self.alpha is not None:
            h = h * (self.alpha / self.rank)
        return h


class CrossAttention(nn.Module):
    """q/k/v projections + fused attention (replaces the reference's
    MemoryEfficientCrossAttention, util.py:213-269). Self-attention when
    no context is passed. With ``use_lora`` each projection gains a
    parallel zero-init LoRA branch (the reference duplicates the whole
    block library for this, unet_lora.py:134-195 — here it's a flag)."""
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    use_lora: bool = False
    lora_rank: int = 4
    lora_alpha: Optional[float] = None
    deterministic: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        if self.use_lora:
            lora = lambda name: LoRA(self.lora_rank, inner, self.lora_alpha,
                                     dtype=self.dtype, name=name)
            q = q + lora("to_q_lora")(x)
            k = k + lora("to_k_lora")(ctx)
            v = v + lora("to_v_lora")(ctx)

        b, sq = q.shape[0], q.shape[1]
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, sk, self.heads, self.dim_head)
        v = v.reshape(b, sk, self.heads, self.dim_head)
        # tag AFTER the reshape: the kernel's [b*h, s, 64] output pads 2x
        # under the (8,128) tile (64 -> 128 minor dim); the merged-head
        # [b, s, inner] view pads only inner -> ceil(inner/128)*128
        # (1.2x at inner=320) — measured 140 MB -> 84 MB per saved
        # level-1 attn_out at train b4 (r5 OOM dump)
        o = checkpoint_name(attention(q, k, v).reshape(b, sq, inner),
                            "attn_out")
        out = nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(o)
        if self.use_lora:
            out = out + LoRA(self.lora_rank, x.shape[-1], self.lora_alpha,
                             dtype=self.dtype, name="to_out_lora")(o)
        return nn.Dropout(self.dropout)(out, deterministic=self.deterministic)


class BasicTransformerBlock(nn.Module):
    """self-attn + cross-attn + GEGLU FF, pre-LN residuals
    (reference util.py:674-705)."""
    heads: int
    dim_head: int
    dropout: float = 0.0
    has_cross: bool = True
    disable_self_attn: bool = False
    use_lora: bool = False
    lora_rank: int = 4
    lora_alpha: Optional[float] = None
    deterministic: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context=None):
        det = self.deterministic
        lora_kw = dict(use_lora=self.use_lora, lora_rank=self.lora_rank,
                       lora_alpha=self.lora_alpha)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(self.heads, self.dim_head, self.dropout,
                               deterministic=det, dtype=self.dtype,
                               name="attn1", **lora_kw)(
            h, context=context if self.disable_self_attn else None)
        if self.has_cross:
            h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
            x = x + CrossAttention(self.heads, self.dim_head, self.dropout,
                                   deterministic=det, dtype=self.dtype,
                                   name="attn2", **lora_kw)(h, context=context)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(dropout=self.dropout, deterministic=det,
                            dtype=self.dtype, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    """GN -> linear proj_in -> N transformer blocks over (h*w) tokens ->
    zero-init proj_out -> residual (reference util.py:311-373).
    Input [N, H, W, C]."""
    heads: int
    dim_head: int
    depth: int = 1
    dropout: float = 0.0
    disable_self_attn: bool = False
    use_lora: bool = False
    lora_rank: int = 4
    lora_alpha: Optional[float] = None
    deterministic: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context=None):
        n, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = GroupNorm32(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = x.reshape(n, h * w, c)
        x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        for d in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, self.dim_head, self.dropout,
                disable_self_attn=self.disable_self_attn,
                use_lora=self.use_lora, lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha,
                deterministic=self.deterministic, dtype=self.dtype,
                name=f"block_{d}")(x, context)
        x = nn.Dense(c, kernel_init=zeros_init, bias_init=zeros_init,
                     dtype=self.dtype, name="proj_out")(x)
        return x.reshape(n, h, w, c) + x_in


class TemporalTransformer(nn.Module):
    """Frames-as-sequence transformer over [(b h w), f, c]
    (reference util.py:1189-1286, only_self_att path). Input
    [B, F, H, W, C]; ``multiply_zero`` makes the residual a no-op for
    image batches."""
    heads: int
    dim_head: int
    depth: int = 1
    dropout: float = 0.0
    multiply_zero: bool = False
    zero_if_single_frame: bool = False  # HiGen WoImg variant (unet_higen.py:88+)
    use_lora: bool = False
    lora_rank: int = 4
    lora_alpha: Optional[float] = None
    deterministic: bool = True
    dtype: Optional[Dtype] = None

    def _use_fused_inner(self, f: int, inner: int, dtype) -> bool:
        """Route through ops/fused_tt.py: inference (deterministic, no
        dropout rng), depth 1, no LoRA, TPU-compatible shape. Init always
        runs the flax modules so the param tree is identical either way."""
        if FUSED_TT == "off" or self.is_initializing():
            return False
        if self.depth != 1 or self.use_lora or not self.deterministic:
            return False
        from ..ops.attention import _on_tpu
        from ..ops.fused_tt import fusable
        if not fusable(f, inner, self.heads, self.dim_head, dtype):
            return False
        return FUSED_TT == "interpret" or _on_tpu()

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = GroupNorm32(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        # (b h w) f c — pixels into batch, frames as tokens
        x = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        if self._use_fused_inner(f, inner, x.dtype):
            from ..ops import fused_tt
            x = fused_tt.fused_tt_inner(
                x, self.variables["params"], heads=self.heads,
                dim_head=self.dim_head, interpret=FUSED_TT == "interpret")
        else:
            for d in range(self.depth):
                x = BasicTransformerBlock(
                    self.heads, self.dim_head, self.dropout, has_cross=True,
                    use_lora=self.use_lora, lora_rank=self.lora_rank,
                    lora_alpha=self.lora_alpha,
                    deterministic=self.deterministic, dtype=self.dtype,
                    name=f"block_{d}")(x, None)
            x = nn.Dense(c, kernel_init=zeros_init, bias_init=zeros_init,
                         dtype=self.dtype, name="proj_out")(x)
        x = x.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        if self.multiply_zero or (self.zero_if_single_frame and f == 1):
            return x_in + 0.0 * x
        return x_in + x


class TemporalConvBlock(nn.Module):
    """4x (GN-SiLU-Conv over frames, kernel (3,1,1)), zero-init last,
    identity residual (reference TemporalConvBlock_v2, util.py:1652-1697).
    Input [B, F, H, W, C]. The (3,1,1) conv is expressed as a 3D conv —
    XLA:TPU lowers it to an MXU-friendly contraction over the frame axis."""
    dropout: float = 0.0
    use_image_dataset: bool = False
    zero_if_single_frame: bool = False  # HiGen WoImg (unet_higen.py:70-86)
    deterministic: bool = True
    dtype: Optional[Dtype] = None

    def _use_fused(self, x) -> bool:
        """Route through ops/fused_tconv.py: inference (deterministic ->
        dropout is identity), real video batches only (the multiply-zero
        image paths keep flax), TPU-validated shape. Init always runs the
        flax modules so the param tree is identical either way."""
        if FUSED_TCONV == "off" or self.is_initializing():
            return False
        if not self.deterministic or self.dtype != jnp.bfloat16:
            return False
        b, f, h, w, c = x.shape
        if self.use_image_dataset or (self.zero_if_single_frame and f == 1):
            return False
        from ..ops.attention import _on_tpu
        from ..ops.fused_tconv import fusable
        if not fusable(f, c, h * w, x.dtype):
            return False
        return FUSED_TCONV == "interpret" or _on_tpu()

    @nn.compact
    def __call__(self, x):
        if self._use_fused(x):
            from ..ops import fused_tconv
            return fused_tconv.fused_temporal_conv_chain(
                x, self.variables["params"],
                interpret=FUSED_TCONV == "interpret")
        identity = x
        c = x.shape[-1]

        def gn_silu_conv(h, name, zero=False, drop=True):
            h = GroupNorm32(dtype=self.dtype, name=f"{name}_norm")(h)
            h = nn.silu(h)
            if drop:
                h = nn.Dropout(self.dropout)(h, deterministic=self.deterministic)
            init = zeros_init if zero else default_kernel
            return tconv3(c, kernel_init=init, bias_init=zeros_init,
                          dtype=self.dtype, name=f"{name}_conv")(h)

        x = gn_silu_conv(x, "conv1", drop=False)
        x = gn_silu_conv(x, "conv2")
        x = gn_silu_conv(x, "conv3")
        x = gn_silu_conv(x, "conv4", zero=True)
        if self.use_image_dataset or (self.zero_if_single_frame
                                      and x.shape[1] == 1):
            return identity + 0.0 * x
        return identity + x


class ResBlock(nn.Module):
    """GN-SiLU-Conv x2 with timestep-embedding injection + skip, then a
    temporal pseudo-3D conv chain (reference util.py:807-927).
    Input [N, H, W, C] with N = batch*frames; ``frames`` recovers the
    video shape for the temporal conv."""
    out_channels: Optional[int] = None
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    use_temporal_conv: bool = True
    use_image_dataset: bool = False
    zero_if_single_frame: bool = False
    deterministic: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, emb, frames: int):
        c_out = self.out_channels or x.shape[-1]

        h = GroupNorm32(dtype=self.dtype, name="in_norm")(x)
        h = nn.silu(h)
        h = conv3x3(c_out, dtype=self.dtype, name="in_conv")(h)

        emb_dim = 2 * c_out if self.use_scale_shift_norm else c_out
        e = nn.Dense(emb_dim, dtype=self.dtype,
                     name="emb_proj")(nn.silu(emb))
        e = e[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(e, 2, axis=-1)
            h = GroupNorm32(dtype=self.dtype, name="out_norm")(h)
            h = h * (1 + scale) + shift
        else:
            h = h + e
            h = GroupNorm32(dtype=self.dtype, name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=self.deterministic)
        h = conv3x3(c_out, kernel_init=zeros_init, bias_init=zeros_init,
                    dtype=self.dtype, name="out_conv")(h)

        if x.shape[-1] == c_out:
            skip = x
        else:
            skip = nn.Conv(c_out, (1, 1), dtype=self.dtype, name="skip")(x)
        h = skip + h

        if self.use_temporal_conv:
            n, hh, ww, cc = h.shape
            v = h.reshape(n // frames, frames, hh, ww, cc)
            v = TemporalConvBlock(dropout=0.1,
                                  use_image_dataset=self.use_image_dataset,
                                  zero_if_single_frame=self.zero_if_single_frame,
                                  deterministic=self.deterministic,
                                  dtype=self.dtype, name="temporal_conv")(v)
            h = v.reshape(n, hh, ww, cc)
        return h


class Upsample(nn.Module):
    """Nearest 2x + 3x3 conv (reference util.py:743-772). [N, H, W, C]."""
    out_channels: Optional[int] = None
    use_conv: bool = True
    trim_lr: bool = False  # SR600 variant trims one row each side after 2x
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
        if self.trim_lr:
            x = x[:, 1:-1, :, :]
        if self.use_conv:
            x = conv3x3(self.out_channels or c, dtype=self.dtype,
                        name="conv")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv (reference util.py:929-970). [N, H, W, C].
    ``pad_h_extra``: SR600 passes padding=(2,1) so H gains one row, which
    its trimming upsampler later removes (unet_sr600.py:152,206)."""
    out_channels: Optional[int] = None
    pad_h_extra: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        pad = ((2, 2), (1, 1)) if self.pad_h_extra else 1
        return nn.Conv(self.out_channels or x.shape[-1], (3, 3),
                       strides=(2, 2), padding=pad, dtype=self.dtype,
                       name="conv")(x)


class PreNormAttention(nn.Module):
    """LN + multihead self-attention with qkv bias + out proj
    (reference Attention/PreNormattention, util.py:1396-1453)."""
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    deterministic: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        inner = self.heads * self.dim_head
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s = q.shape[0], q.shape[1]
        q = q.reshape(b, s, self.heads, self.dim_head)
        k = k.reshape(b, s, self.heads, self.dim_head)
        v = v.reshape(b, s, self.heads, self.dim_head)
        o = checkpoint_name(attention(q, k, v).reshape(b, s, inner),
                            "attn_out")  # tag post-reshape (padding, above)
        o = nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(o)
        o = nn.Dropout(self.dropout)(o, deterministic=self.deterministic)
        return o + x


class TransformerV2(nn.Module):
    """Small pre-norm transformer used as a temporal condition encoder
    (I2VGen local-image stem, TF-T2V condition stems; reference
    util.py:1434-1453). Matches the reference exactly: pre-LN attention
    with residual, then an UN-normalized GELU FF with residual."""
    heads: int = 8
    dim_head: int = 64
    depth: int = 1
    dropout_atte: float = 0.05
    dropout_ffn: float = 0.05
    mlp_mult: int = 4
    deterministic: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        det = self.deterministic
        for d in range(self.depth):
            x = PreNormAttention(self.heads, self.dim_head, self.dropout_atte,
                                 deterministic=det, dtype=self.dtype,
                                 name=f"attn_{d}")(x)
            # reference FF has NO pre-norm (util.py:1447-1449)
            h = nn.Dense(x.shape[-1] * self.mlp_mult, dtype=self.dtype,
                         name=f"ff_in_{d}")(x)
            h = nn.gelu(h)
            h = nn.Dropout(self.dropout_ffn)(h, deterministic=det)
            h = nn.Dense(x.shape[-1], dtype=self.dtype, name=f"ff_out_{d}")(h)
            x = x + h
        return x


def drop_path_mask(key, batch: int, prob: float, p_all_zero: float = 0.0,
                   p_all_keep: float = 0.0):
    """Per-sample DropPath keep-mask with forced all-zero/all-keep sets
    (reference DropPath + TFT2V misc_dropout sampling, util.py:1700+,
    unet_tf2tv.py:581-590). Returns float mask [batch]."""
    k1, k2, k3 = jax.random.split(key, 3)
    keep = (jax.random.uniform(k1, (batch,)) >= prob).astype(jnp.float32)
    mode = jax.random.uniform(k2, (batch,))
    keep = jnp.where(mode < p_all_zero, 0.0, keep)
    keep = jnp.where((mode >= p_all_zero) & (mode < p_all_zero + p_all_keep),
                     1.0, keep)
    return keep
