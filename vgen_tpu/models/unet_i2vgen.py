"""UNetSD_I2VGen — the I2VGen-XL image-to-video UNet.

TPU-native re-implementation of the reference model
(reference: tools/modules/unet/unet_i2vgen.py:19-418). Shares the T2V
backbone (same per-scale structure, reference :136-230) and adds the
I2VGen conditioning stems:

  * local_image (first-frame latent): conv stem + TransformerV2 temporal
    encoder, channel-concatenated to x (reference :116-124, :280-295 —
    including the acknowledged double-add of the stem output, kept for
    released-weight parity).
  * 64 extra context tokens from a conv pyramid over the first-frame
    latent (adaptive 32x32 pool + stride-2 convs -> 8x8 tokens of 1024)
    (reference :126-132, :311-316).
  * global CLIP image feature -> context_embedding MLP -> num_tokens=4
    context tokens (reference :99-102, :319-322).
  * fps embedding always active (reference :104-109, :297-299).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.registry import MODEL
from .blocks import TimestepEmbedding, TransformerV2, sinusoidal_embedding
from .unet_t2v import UNetSD_T2VBase, filter_construct


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d semantics for NHWC, as two matmuls
    (window bounds floor(i*H/o)..ceil((i+1)*H/o)); static shapes, so the
    pooling matrices are compile-time constants that ride the MXU."""
    n, h, w, c = x.shape
    oh, ow = out_hw

    def pool_matrix(size, out):
        m = np.zeros((out, size), np.float32)
        for i in range(out):
            a = (i * size) // out
            b = -((-(i + 1) * size) // out)  # ceil
            m[i, a:b] = 1.0 / (b - a)
        return jnp.asarray(m)

    mh = pool_matrix(h, oh)
    mw = pool_matrix(w, ow)
    x = jnp.einsum("oh,nhwc->nowc", mh, x)
    return jnp.einsum("pw,nowc->nopc", mw, x)


class UNetSD_I2VGen(UNetSD_T2VBase):
    """I2VGen-XL UNet; config surface mirrors the reference."""
    concat_dim: int = 4
    num_tokens: int = 4
    adapter_transformer_layers: int = 1

    def setup(self):
        embed_dim = self.dim * 4
        det = not self.training

        self.time_embed = TimestepEmbedding(embed_dim, dtype=self.dtype)
        # fps embedding is ALWAYS present (reference :104-109), zero-init
        self.fps_embedding = TimestepEmbedding(embed_dim, zero_init_out=True,
                                               dtype=self.dtype)
        # global image feature -> num_tokens context tokens (reference :99-102)
        self.context_embedding_fc1 = nn.Dense(embed_dim, dtype=self.dtype)
        self.context_embedding_fc2 = nn.Dense(
            self.context_dim * self.num_tokens, dtype=self.dtype)

        # local image concat stem (reference :116-124)
        cd = self.concat_dim
        self.local_image_concat = [
            nn.Conv(cd * 4, (3, 3), padding=1, dtype=self.dtype),
            nn.Conv(cd * 4, (3, 3), padding=1, dtype=self.dtype),
            nn.Conv(cd, (3, 3), padding=1, dtype=self.dtype),
        ]
        self.local_temporal_encoder = TransformerV2(
            heads=2, dim_head=cd, depth=self.adapter_transformer_layers,
            dropout_atte=0.05, dropout_ffn=0.05, deterministic=det,
            dtype=self.dtype)

        # local image context pyramid -> 8x8 tokens of 1024 (reference :126-132)
        self.local_image_embedding = [
            nn.Conv(cd * 8, (3, 3), padding=1, dtype=self.dtype),
            nn.Conv(cd * 16, (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype),
            # the reference hardcodes 1024 here (== context_dim in all
            # shipped configs); ours follows context_dim
            nn.Conv(self.context_dim, (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype),
        ]

        self._setup_backbone(self.in_dim + self.concat_dim)

    def _concat_branch(self, local_image, b, f, h, w):
        """First-frame latent + temporal position masks -> conv stem ->
        TransformerV2 over frames (reference :280-295). local_image:
        [b, 1, h, w, 4]. Returns [b, f, h, w, concat_dim]."""
        if f > 1:
            pos = jnp.arange(1, f, dtype=jnp.float32) / (f - 1)
            mask_pos = jnp.ones((b, f - 1, h, w, local_image.shape[-1]),
                                jnp.float32) * pos[None, :, None, None, None]
            ximg = jnp.concatenate([local_image[:, :1], mask_pos], axis=1)
        else:
            ximg = local_image
        ximg = ximg.reshape(b * f, h, w, -1)
        ximg = self.local_image_concat[0](ximg)
        ximg = nn.silu(ximg)
        ximg = self.local_image_concat[1](ximg)
        ximg = nn.silu(ximg)
        ximg = self.local_image_concat[2](ximg)
        cd = ximg.shape[-1]
        # (b h w) f c tokens for the temporal encoder
        ximg = ximg.reshape(b, f, h, w, cd).transpose(0, 2, 3, 1, 4)
        ximg = ximg.reshape(b * h * w, f, cd)
        ximg = self.local_temporal_encoder(ximg)
        ximg = ximg.reshape(b, h, w, f, cd).transpose(0, 3, 1, 2, 4)
        # reference adds the stem output twice (:294-295) — kept for parity
        return ximg + ximg

    def _local_context_tokens(self, local_image, b, h, w):
        """Conv pyramid over the first-frame latent -> (h/4 * w/4 of the
        32x32 pooled map) = 64 tokens of dim 1024 (reference :311-316)."""
        x = local_image.reshape(b, h, w, -1)
        x = nn.silu(self.local_image_embedding[0](x))
        x = adaptive_avg_pool2d(x, (32, 32))
        x = nn.silu(self.local_image_embedding[1](x))
        x = self.local_image_embedding[2](x)
        return x.reshape(b, -1, self.context_dim)

    def __call__(self, x, t, y=None, image=None, local_image=None, fps=None,
                 zero_y=None, video_mask=None, focus_present_mask=None,
                 prob_focus_present=0.0, **kwargs):
        """x: [b,f,h,w,4]; local_image: [b,1,h,w,4] or [b,f,h,w,4] (first
        frame used) or [b,h,w,4]; image: [b, y_dim] global CLIP feature."""
        b, f, h, w, _ = x.shape
        assert local_image is not None, "I2VGen requires local_image"
        if local_image.ndim == 4:
            local_image = local_image[:, None]
        local_image = local_image[:, :1]

        concat = self._concat_branch(local_image.astype(jnp.float32),
                                     b, f, h, w)

        emb = self.time_embed(sinusoidal_embedding(t, self.dim))
        if fps is None:
            fps = jnp.full((b,), self.default_fps, jnp.int32)
        emb = emb + self.fps_embedding(sinusoidal_embedding(fps, self.dim))
        emb = jnp.repeat(emb, f, axis=0)

        # context: text tokens + 64 local tokens + num_tokens global tokens
        if y is not None:
            context = y
        else:
            assert zero_y is not None
            zy = jnp.broadcast_to(zero_y[:1], (b,) + zero_y.shape[1:])
            context = zy[:, :1, :]
        local_ctx = self._local_context_tokens(local_image, b, h, w)
        context = jnp.concatenate([context, local_ctx.astype(context.dtype)],
                                  axis=1)
        if image is not None:
            ic = nn.silu(self.context_embedding_fc1(image))
            ic = self.context_embedding_fc2(ic)
            ic = ic.reshape(b, self.num_tokens, self.context_dim)
            context = jnp.concatenate([context, ic.astype(context.dtype)],
                                      axis=1)
        context = jnp.repeat(context, f, axis=0)

        x = jnp.concatenate([x, concat.astype(x.dtype)], axis=-1)
        x = x.reshape(b * f, h, w, x.shape[-1])
        return self._run_backbone(x, emb, context, b, f, h, w)


@MODEL.register_function("UNetSD_I2VGen")
def build_unet_i2vgen(**cfg):
    return filter_construct(UNetSD_I2VGen, cfg)
