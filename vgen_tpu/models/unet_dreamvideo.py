"""UNetSD_DreamVideo — subject/motion customization with adapters.

TPU-native re-implementation of the reference model
(reference: tools/modules/unet/unet_dreamvideo.py:20-375). T2V backbone
where spatial/temporal transformers carry bottleneck adapters per the
``spatial_adapter_list`` / ``temporal_adapter_list`` position configs
(wired :114-199); forward takes ``adapter_condition`` (a CLIP image
feature of the subject) + ``adapter_condition_lam`` strength (:276-286).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import MODEL
from .adapters import SpatialTransformerWithAdapter, TemporalTransformerWithAdapter
from .blocks import Downsample, GroupNorm32, ResBlock, Upsample, \
    sinusoidal_embedding, zeros_init
from .unet_t2v import UNetSD_T2VBase, filter_construct


class UNetSD_DreamVideo(UNetSD_T2VBase):
    """DreamVideo UNet; config surface mirrors the reference."""
    spatial_adapter_list: Tuple[str, ...] = ()
    spatial_adapter_position_list: Tuple[str, ...] = ("", "parallel", "")
    spatial_adapter_hidden_dim: Optional[int] = None
    temporal_adapter_list: Tuple[str, ...] = ()
    temporal_adapter_position_list: Tuple[str, ...] = ("parallel", "parallel",
                                                       "parallel")
    temporal_adapter_condition_dim: Optional[int] = None
    temporal_adapter_hidden_dim: Optional[int] = None

    def setup(self):
        self._setup_embeddings()
        det = not self.training

        def spatial(ch):
            return SpatialTransformerWithAdapter(
                heads=ch // self.head_dim, dim_head=self.head_dim, depth=1,
                adapter_list=tuple(self.spatial_adapter_list),
                adapter_position_list=tuple(self.spatial_adapter_position_list),
                adapter_hidden_dim=self.spatial_adapter_hidden_dim,
                deterministic=det, dtype=self.dtype)

        def temporal(ch, heads=None):
            return TemporalTransformerWithAdapter(
                heads=heads or ch // self.head_dim, dim_head=self.head_dim,
                depth=1, multiply_zero=self.use_image_dataset,
                adapter_list=tuple(self.temporal_adapter_list),
                adapter_position_list=tuple(self.temporal_adapter_position_list),
                adapter_hidden_dim=self.temporal_adapter_hidden_dim,
                adapter_condition_dim=self.temporal_adapter_condition_dim,
                deterministic=det, dtype=self.dtype)

        def resblock(ch):
            return ResBlock(out_channels=ch, dropout=self.dropout,
                            use_scale_shift_norm=False,
                            use_image_dataset=self.use_image_dataset,
                            deterministic=det, dtype=self.dtype)

        enc_dims = [self.dim * u for u in (1,) + tuple(self.dim_mult)]
        dec_dims = [self.dim * u
                    for u in (self.dim_mult[-1],) + tuple(self.dim_mult[::-1])]
        blocks = [[nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype),
                   temporal(self.dim, heads=self.num_heads)]]
        scale = 1.0
        for i, (in_ch, out_ch) in enumerate(zip(enc_dims[:-1], enc_dims[1:])):
            for j in range(self.num_res_blocks):
                block = [resblock(out_ch)]
                if scale in self.attn_scales:
                    block.append(spatial(out_ch))
                    if self.temporal_attention:
                        block.append(temporal(out_ch))
                blocks.append(block)
                if i != len(self.dim_mult) - 1 and j == self.num_res_blocks - 1:
                    blocks.append([Downsample(out_ch, dtype=self.dtype)])
                    scale /= 2.0
        self.input_blocks = blocks

        mid_ch = enc_dims[-1]
        self.middle_block = [resblock(mid_ch), spatial(mid_ch),
                             temporal(mid_ch), resblock(mid_ch)]

        out_blocks = []
        for i, (in_ch, out_ch) in enumerate(zip(dec_dims[:-1], dec_dims[1:])):
            for j in range(self.num_res_blocks + 1):
                block = [resblock(out_ch)]
                if scale in self.attn_scales:
                    block.append(spatial(out_ch))
                    if self.temporal_attention:
                        block.append(temporal(out_ch))
                if i != len(self.dim_mult) - 1 and j == self.num_res_blocks:
                    block.append(Upsample(out_ch, dtype=self.dtype))
                    scale *= 2.0
                out_blocks.append(block)
        self.output_blocks = out_blocks

        self.out_norm = GroupNorm32(dtype=self.dtype)
        self.out_conv = nn.Conv(self.out_dim, (3, 3), padding=1,
                                kernel_init=zeros_init, bias_init=zeros_init,
                                dtype=self.dtype)

    def _forward_single(self, module, x, emb, context, frames,
                        adapter_condition=None, adapter_condition_lam=1.0):
        name = type(module).__name__
        if "ResBlock" in name:
            return module(x, emb, frames)
        if "SpatialTransformerWithAdapter" in name:
            # spatial adapters are unconditioned (reference :280-284)
            return module(x, context, None, adapter_condition_lam)
        if "TemporalTransformerWithAdapter" in name:
            n, h, w, c = x.shape
            v = x.reshape(n // frames, frames, h, w, c)
            v = module(v, adapter_condition, adapter_condition_lam)
            return v.reshape(n, h, w, c)
        return module(x)

    def __call__(self, x, t, y=None, fps=None, zero_y=None,
                 adapter_condition=None, adapter_condition_lam: float = 1.0,
                 video_mask=None, focus_present_mask=None,
                 prob_focus_present=0.0, **kwargs):
        b, f, h, w, _ = x.shape
        emb = self.time_embed(sinusoidal_embedding(t, self.dim))
        if self.use_fps_condition:
            if fps is None:
                fps = jnp.full((b,), self.default_fps, jnp.int32)
            emb = emb + self.fps_embedding(sinusoidal_embedding(fps, self.dim))
        emb = jnp.repeat(emb, f, axis=0)

        if y is not None:
            context = y
        else:
            assert zero_y is not None
            context = jnp.broadcast_to(zero_y[:1], (b,) + zero_y.shape[1:])[:, :1]
        context = jnp.repeat(context, f, axis=0)

        x = x.reshape(b * f, h, w, x.shape[-1])
        if self.dtype is not None:
            x = x.astype(self.dtype)

        xs = []
        for block in self.input_blocks:
            for m in block:
                x = self._forward_single(m, x, emb, context, f,
                                         adapter_condition,
                                         adapter_condition_lam)
            xs.append(x)
        for m in self.middle_block:
            x = self._forward_single(m, x, emb, context, f, adapter_condition,
                                     adapter_condition_lam)
        for block in self.output_blocks:
            x = jnp.concatenate([x, xs.pop()], axis=-1)
            for m in block:
                x = self._forward_single(m, x, emb, context, f,
                                         adapter_condition,
                                         adapter_condition_lam)
        x = self.out_conv(nn.silu(self.out_norm(x)))
        return x.reshape(b, f, h, w, self.out_dim).astype(jnp.float32)


@MODEL.register_function("UNetSD_DreamVideo")
def build_unet_dreamvideo(**cfg):
    return filter_construct(UNetSD_DreamVideo, cfg)
