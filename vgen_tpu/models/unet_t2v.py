"""UNetSD_T2VBase — the ModelScope-T2V spatio-temporal UNet.

TPU-native re-implementation of the reference model
(reference: tools/modules/unet/unet_t2v.py:19-348). Same architecture —
per-scale [ResBlock, SpatialTransformer, TemporalTransformer] with an
init Conv+TemporalTransformer stem and a zero-init output head — built
as flax.linen in NHWC:

  * video tensor [b, f, h, w, c]; frames fold into batch for spatial ops
    (one reshape, not einops round-trips), pixels fold into batch for
    temporal attention inside TemporalTransformer.
  * remat (jax.checkpoint) at transformer/resblock granularity replaces
    fairscale checkpoint_wrapper (reference unet_t2v.py:282).
  * ``zero_y`` (the CLIP embedding of the empty prompt) is a call-time
    input rather than constructor state — functional style, same
    semantics as reference :248-255.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import MODEL
from .blocks import (Downsample, GroupNorm32, ResBlock, SpatialTransformer,
                     TemporalTransformer, TimestepEmbedding, Upsample,
                     sinusoidal_embedding, zeros_init)


def filter_construct(cls, cfg: dict, **overrides):
    """Build a flax dataclass module from a yaml-style config dict,
    dropping keys the module doesn't declare (the reference models accept
    **kwargs and ignore extras, e.g. unet_t2v.py:50)."""
    fields = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in cfg.items() if k in fields}
    kwargs.update(overrides)
    # yaml lists -> tuples (hashable static config)
    for k, v in list(kwargs.items()):
        if isinstance(v, list):
            kwargs[k] = tuple(v)
    return cls(**kwargs)


class UNetSD_T2VBase(nn.Module):
    """Text-to-video UNet (config surface mirrors the reference)."""
    in_dim: int = 4
    dim: int = 320
    y_dim: int = 1024
    context_dim: int = 1024
    out_dim: int = 4
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    head_dim: int = 64
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = (1.0, 0.5, 0.25)
    use_scale_shift_norm: bool = False
    dropout: float = 0.1
    temporal_attn_times: int = 1
    temporal_attention: bool = True
    use_checkpoint: bool = True
    use_image_dataset: bool = False
    use_sim_mask: bool = False
    use_fps_condition: bool = False
    default_fps: int = 8
    upsample_trim: bool = False  # SR600 trims rows after nearest-2x
    downsample_pad_h: bool = False  # SR600 pads H by 2 when downsampling
    wo_img: bool = False  # HiGen: temporal blocks no-op on 1-frame input
    use_lora: bool = False
    lora_rank: int = 4
    lora_alpha: Optional[float] = None
    training: bool = False
    dtype: Optional[Any] = None
    # remat save policy: None (recompute everything inside each block),
    # "dots" (save every dot_general output — projections/FF matmuls are
    # stored, not recomputed in the backward), or "dots_no_batch"
    # (jax checkpoint_dots_with_no_batch_dims_saveable). Trades HBM for
    # backward-pass FLOPs; measure per workload (tools_dev/profile_train).
    remat_policy: Optional[str] = None
    # Per-level remat skip: blocks at spatial scale <= this threshold are
    # NOT rematerialized (their activations are saved). The UNet's FLOPs
    # are balanced across levels (HW halves 4x while C^2 grows 4x: levels
    # 1-3 each carry ~equal conv+matmul work) but activation BYTES shrink
    # 4x per level — so at e.g. 0.25 the backward replay of ~35% of the
    # network's FLOPs is eliminated for a small HBM cost (level-3/4
    # tensors are 16-64x smaller than level-1). 0.0 = remat everywhere.
    remat_skip_scale: float = 0.0

    def setup(self):
        self._setup_embeddings()
        self._setup_backbone(self.in_dim)

    def _setup_embeddings(self):
        embed_dim = self.dim * 4
        self.time_embed = TimestepEmbedding(embed_dim, dtype=self.dtype)
        if self.use_fps_condition:
            # zero-init output so the fps condition starts as a no-op
            # (reference unet_t2v.py:98-104)
            self.fps_embedding = TimestepEmbedding(
                embed_dim, zero_init_out=True, dtype=self.dtype)

    def _setup_backbone(self, in_channels: int):
        """Shared encoder/middle/decoder/head (reference unet_t2v.py:110-208;
        identical structure in unet_i2vgen.py:136-230 and others)."""
        embed_dim = self.dim * 4
        det = not self.training
        enc_dims = [self.dim * u for u in (1,) + tuple(self.dim_mult)]
        dec_dims = [self.dim * u
                    for u in (self.dim_mult[-1],) + tuple(self.dim_mult[::-1])]

        # frames is a static python int — keep it out of remat tracing
        # (static_argnums counts self, so frames is arg 3)
        policies = {
            None: None,
            # save ONLY the attention outputs (tagged in blocks.py):
            # softmax-attention is the costliest part of a block's
            # recompute, while its saved output is small relative to the
            # dot-products a dots policy would store (which OOM at 1.4B)
            "attn": jax.checkpoint_policies.save_only_these_names(
                "attn_out"),
            # attn outputs + GroupNorm stats (tiny [N,32,1] f32 pairs —
            # blocks._NamedStatsGN): the r5 train trace shows 17% of
            # step time in reduces, largely the bwd replay recomputing
            # GN stats; saving them is memory-free
            "attn_gn": jax.checkpoint_policies.save_only_these_names(
                "attn_out", "gn_stats"),
            "gn": jax.checkpoint_policies.save_only_these_names(
                "gn_stats"),
            "dots": jax.checkpoint_policies.checkpoint_dots,
            "dots_no_batch":
                jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
        }
        if self.remat_policy not in policies:
            raise ValueError(
                f"unknown remat_policy {self.remat_policy!r}; valid: "
                f"{sorted(str(k) for k in policies)}")
        pol = policies[self.remat_policy]
        kw = {"policy": pol} if pol is not None else {}

        def _maybe_remat(cls, scale, **remat_kw):
            if not self.use_checkpoint or scale <= self.remat_skip_scale:
                return cls
            return nn.remat(cls, **remat_kw, **kw)

        def spatial(ch, scale=1.0):
            ST = _maybe_remat(SpatialTransformer, scale)
            return ST(heads=ch // self.head_dim, dim_head=self.head_dim,
                      depth=1, use_lora=self.use_lora,
                      lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                      deterministic=det, dtype=self.dtype)

        def temporal(ch, heads=None, scale=1.0):
            TT = _maybe_remat(TemporalTransformer, scale)
            return TT(heads=heads or ch // self.head_dim,
                      dim_head=self.head_dim, depth=1,
                      multiply_zero=self.use_image_dataset,
                      zero_if_single_frame=self.wo_img,
                      use_lora=self.use_lora, lora_rank=self.lora_rank,
                      lora_alpha=self.lora_alpha,
                      deterministic=det, dtype=self.dtype)

        def resblock(ch, scale=1.0):
            # the reference constructs every ResBlock with
            # use_scale_shift_norm=False regardless of the config flag
            # (e.g. unet_t2v.py:124, unet_sr600.py:129) — match it for
            # released-weight compatibility; the field stays for API parity
            RB = _maybe_remat(ResBlock, scale, static_argnums=(3,))
            return RB(out_channels=ch, dropout=self.dropout,
                      use_scale_shift_norm=False,
                      use_image_dataset=self.use_image_dataset,
                      zero_if_single_frame=self.wo_img,
                      deterministic=det, dtype=self.dtype)

        # ---- encoder (reference :110-151) --------------------------------
        blocks = []
        init_block = [nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype)]
        if self.temporal_attention:
            # init temporal transformer uses the GLOBAL head count
            # (inner = num_heads*head_dim, != dim) — reference :114-116
            init_block.append(temporal(self.dim, heads=self.num_heads))
        blocks.append(init_block)

        shortcut_dims = [self.dim]
        scale = 1.0
        for i, (in_ch, out_ch) in enumerate(zip(enc_dims[:-1], enc_dims[1:])):
            for j in range(self.num_res_blocks):
                block = [resblock(out_ch, scale)]
                if scale in self.attn_scales:
                    block.append(spatial(out_ch, scale))
                    if self.temporal_attention:
                        block.append(temporal(out_ch, scale=scale))
                blocks.append(block)
                shortcut_dims.append(out_ch)
                if i != len(self.dim_mult) - 1 and j == self.num_res_blocks - 1:
                    blocks.append([Downsample(
                        out_ch, pad_h_extra=self.downsample_pad_h,
                        dtype=self.dtype)])
                    shortcut_dims.append(out_ch)
                    scale /= 2.0
        self.input_blocks = blocks
        self._shortcut_dims = tuple(shortcut_dims)

        # ---- middle (reference :153-172) ----------------------------------
        mid_ch = enc_dims[-1]
        middle = [resblock(mid_ch, scale), spatial(mid_ch, scale)]
        if self.temporal_attention:
            middle.append(temporal(mid_ch, scale=scale))
        middle.append(resblock(mid_ch, scale))
        self.middle_block = middle

        # ---- decoder (reference :174-203) ----------------------------------
        out_blocks = []
        scale_d = scale
        for i, (in_ch, out_ch) in enumerate(zip(dec_dims[:-1], dec_dims[1:])):
            for j in range(self.num_res_blocks + 1):
                block = [resblock(out_ch, scale_d)]
                if scale_d in self.attn_scales:
                    block.append(spatial(out_ch, scale_d))
                    if self.temporal_attention:
                        block.append(temporal(out_ch, scale=scale_d))
                if i != len(self.dim_mult) - 1 and j == self.num_res_blocks:
                    block.append(Upsample(out_ch, trim_lr=self.upsample_trim,
                                          dtype=self.dtype))
                    scale_d *= 2.0
                out_blocks.append(block)
        self.output_blocks = out_blocks

        # ---- head (reference :205-208, zero-init final conv) --------------
        self.out_norm = GroupNorm32(dtype=self.dtype)
        self.out_conv = nn.Conv(self.out_dim, (3, 3), padding=1,
                                kernel_init=zeros_init, bias_init=zeros_init,
                                dtype=self.dtype)

    # ----------------------------------------------------------------- #
    def _forward_single(self, module, x, emb, context, frames):
        """Dispatch one block module (reference _forward_single
        :280-348). x is [b*f, h, w, c]."""
        name = type(module).__name__
        if "ResBlock" in name:
            return module(x, emb, frames)
        if "SpatialTransformer" in name:
            return module(x, context)
        if "TemporalTransformer" in name:
            n, h, w, c = x.shape
            v = x.reshape(n // frames, frames, h, w, c)
            v = module(v)
            return v.reshape(n, h, w, c)
        return module(x)  # Conv / Downsample / Upsample

    def __call__(self, x, t, y=None, fps=None, zero_y=None, video_mask=None,
                 focus_present_mask=None, prob_focus_present=0.0, **kwargs):
        """x: [b, f, h, w, c]; t: [b]; y: [b, L, context_dim] text tokens;
        zero_y: [1 or b, L, context_dim] empty-prompt embedding used when
        y is None. Returns [b, f, h, w, out_dim]."""
        b, f, h, w, _ = x.shape

        emb = self.time_embed(sinusoidal_embedding(t, self.dim))
        if self.use_fps_condition:
            if fps is None:  # fall back to default_fps (reference
                # unet_i2vgen.py:297-299); also keeps params materialized
                fps = jnp.full((b,), self.default_fps, jnp.int32)
            emb = emb + self.fps_embedding(sinusoidal_embedding(fps, self.dim))
        emb = jnp.repeat(emb, f, axis=0)  # [b*f, embed_dim]

        if y is not None:
            context = y
        else:
            assert zero_y is not None, "y or zero_y required"
            zy = jnp.broadcast_to(zero_y[:1], (b,) + zero_y.shape[1:])
            context = zy[:, :1, :]
        context = jnp.repeat(context, f, axis=0)  # [b*f, L, ctx]

        x = x.reshape(b * f, h, w, x.shape[-1])
        return self._run_backbone(x, emb, context, b, f, h, w)

    def _run_backbone(self, x, emb, context, b, f, h, w, skip_hook=None):
        """skip_hook(idx, x, skip) -> (x, skip): per-decoder-block transform
        of the trunk and the popped skip before concatenation (SR600's
        FreeU-style boosts, unet_sr600.py:276-290)."""
        if self.dtype is not None:
            x = x.astype(self.dtype)

        xs = []
        for block in self.input_blocks:
            for m in block:
                x = self._forward_single(m, x, emb, context, f)
            xs.append(x)

        for m in self.middle_block:
            x = self._forward_single(m, x, emb, context, f)

        for idx, block in enumerate(self.output_blocks):
            skip = xs.pop()
            if skip_hook is not None:
                x, skip = skip_hook(idx, x, skip)
            x = jnp.concatenate([x, skip], axis=-1)
            for m in block:
                x = self._forward_single(m, x, emb, context, f)

        x = self.out_conv(nn.silu(self.out_norm(x)))
        return x.reshape(b, f, h, w, self.out_dim).astype(jnp.float32)


@MODEL.register_function("UNetSD_T2VBase")
def build_unet_t2v(**cfg):
    return filter_construct(UNetSD_T2VBase, cfg)


@MODEL.register_function("UNetSD_LoRA")
def build_unet_lora(**cfg):
    """InstructVideo's LoRA UNet (reference unet_lora.py:1090+): the T2V
    architecture with zero-init LoRA branches on every attention q/k/v/out.
    The reference duplicates the whole block library; here it's the same
    backbone with use_lora=True."""
    cfg.setdefault("use_lora", True)
    cfg.setdefault("lora_rank", 4)
    return filter_construct(UNetSD_T2VBase, cfg)
