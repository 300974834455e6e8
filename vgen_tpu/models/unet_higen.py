"""UNetSD_HiGen — spatio-temporally decoupled T2V (HiGen).

TPU-native re-implementation of the reference model
(reference: tools/modules/unet/unet_higen.py:176-542). Shares the T2V
backbone with HiGen's additions:

  * spat_prior: the phase-1 generated key-frame latent, injected at the
    init conv through a zero-init img_embedding conv (reference :279-281,
    :535-538).
  * motion_cond (per-frame motion factor) and appearance_cond (per-frame
    32-d similarity vector) embedded into the timestep embedding through
    zero-init MLPs (reference :265-277, :387-399, :440-441).
  * context via TextContextCrossTransformerMultiLayer: learned query
    tokens cross-attending to the text features (reference :154-173).
  * WoImg block variants: temporal mixing becomes identity for 1-frame
    (phase-1 spatial prior) inputs (reference :35-152) — here a static
    frame-count check on the shared blocks (wo_img=True).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import MODEL
from .blocks import (BasicTransformerBlock, TimestepEmbedding,
                     sinusoidal_embedding)
from .unet_t2v import UNetSD_T2VBase, filter_construct


class TextContextCrossTransformer(nn.Module):
    """Learned tokens cross-attend to mapped text features
    (reference TextContextCrossTransformerMultiLayer, :154-173)."""
    y_dim: int
    depth: int
    embed_dim: int
    context_dim: int
    num_tokens: int
    deterministic: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, y):
        b = y.shape[0]
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="input_mapping")(y)
        tokens = self.param("tokens",
                            nn.initializers.normal(self.embed_dim ** -0.5),
                            (1, self.num_tokens, self.embed_dim))
        out = jnp.broadcast_to(tokens, (b, self.num_tokens, self.embed_dim))
        for d in range(self.depth):
            out = BasicTransformerBlock(
                heads=8, dim_head=self.embed_dim // 8, dropout=0.0,
                disable_self_attn=True, deterministic=self.deterministic,
                dtype=self.dtype, name=f"block_{d}")(out, context=x)
        return nn.Dense(self.context_dim, dtype=self.dtype,
                        name="output_mapping")(out)


class UNetSD_HiGen(UNetSD_T2VBase):
    """HiGen UNet; config surface mirrors the reference."""
    num_tokens: int = 16
    context_embedding_depth: int = 4
    wo_img: bool = True

    def setup(self):
        embed_dim = self.dim * 4
        det = not self.training
        self._setup_embeddings()
        self.context_embedding = TextContextCrossTransformer(
            y_dim=self.y_dim, depth=self.context_embedding_depth,
            embed_dim=embed_dim, context_dim=self.context_dim,
            num_tokens=self.num_tokens, deterministic=det, dtype=self.dtype)
        # zero-init so the new conditions start as no-ops (reference
        # :265-281)
        self.asim_embedding = TimestepEmbedding(embed_dim, zero_init_out=True,
                                                dtype=self.dtype)
        self.msim_embedding = TimestepEmbedding(embed_dim, zero_init_out=True,
                                                dtype=self.dtype)
        self.img_embedding = nn.Conv(self.dim, (3, 3), padding=1,
                                     kernel_init=nn.initializers.zeros,
                                     bias_init=nn.initializers.zeros,
                                     dtype=self.dtype)
        self._setup_backbone(self.in_dim)

    def _motion_embedding(self, b, f, motion_cond):
        """(reference get_motion_embedding :387-396)."""
        if motion_cond.ndim == 2:
            m = motion_cond.shape[1]
            emb = sinusoidal_embedding(motion_cond.reshape(-1), self.dim)
            emb = emb.reshape(b, m, self.dim)
            if m != f:
                # linear interp over the frame axis (reference :391)
                emb = jax.image.resize(emb, (b, f, self.dim), method="linear")
            return self.msim_embedding(emb.reshape(b * f, self.dim))
        return self.msim_embedding(sinusoidal_embedding(motion_cond, self.dim))

    def __call__(self, x, t, y=None, fps=None, spat_prior=None,
                 motion_cond=None, appearance_cond=None, zero_y=None,
                 video_mask=None, focus_present_mask=None,
                 prob_focus_present=0.0, **kwargs):
        """x: [b,f,h,w,4]; spat_prior: [b,h,w,4] phase-1 key-frame latent;
        motion_cond: [b, f or f-1] ints; appearance_cond: [b, f, 32]."""
        b, f, h, w, _ = x.shape
        emb = self.time_embed(sinusoidal_embedding(t, self.dim))
        if self.use_fps_condition and fps is not None:
            emb = emb + self.fps_embedding(sinusoidal_embedding(fps, self.dim))
        emb = jnp.repeat(emb, f, axis=0)
        if motion_cond is not None:
            emb = emb + self._motion_embedding(b, f, motion_cond)
        if appearance_cond is not None:
            # [b, f, 32] -> per-frame embedding (reference :398-399).
            # phase-1 passes [b, 1, f]-shaped ones; normalize to [b, f', 32]
            ac = appearance_cond
            if ac.shape[-1] != 32:
                ac = jnp.ones((b, f, 32), jnp.float32) * ac.reshape(b, -1)[:, :1, None]
            if ac.shape[1] != f:
                ac = jnp.broadcast_to(ac[:, :1], (b, f, 32))
            emb = emb + self.asim_embedding(ac.reshape(b * f, 32))

        context = self.context_embedding(
            y if y is not None else
            jnp.broadcast_to(zero_y[:1], (b,) + zero_y.shape[1:]))
        context = jnp.repeat(context, f, axis=0)

        x = x.reshape(b * f, h, w, x.shape[-1])
        if self.dtype is not None:
            x = x.astype(self.dtype)

        # init conv + spat_prior injection (reference :535-538)
        xs = []
        init_block = self.input_blocks[0]
        x = init_block[0](x)
        if spat_prior is not None:
            prior = self.img_embedding(spat_prior.astype(x.dtype))
            x = x + jnp.repeat(prior, f, axis=0)
        for m in init_block[1:]:
            x = self._forward_single(m, x, emb, context, f)
        xs.append(x)

        for block in self.input_blocks[1:]:
            for m in block:
                x = self._forward_single(m, x, emb, context, f)
            xs.append(x)
        for m in self.middle_block:
            x = self._forward_single(m, x, emb, context, f)
        for block in self.output_blocks:
            x = jnp.concatenate([x, xs.pop()], axis=-1)
            for m in block:
                x = self._forward_single(m, x, emb, context, f)
        x = self.out_conv(nn.silu(self.out_norm(x)))
        return x.reshape(b, f, h, w, self.out_dim).astype(jnp.float32)


@MODEL.register_function("UNetSD_HiGen")
def build_unet_higen(**cfg):
    return filter_construct(UNetSD_HiGen, cfg)
