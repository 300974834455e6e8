"""DINO ViT-S/16 feature extractor (for the DINO-I metric).

TPU-native equivalent of the bundled facebookresearch/dino vit_small
(reference: metric/dino/, ~4k LoC vendored; used by
metric/cal_metric_DreamVideo.py:22-211). Standard pre-LN ViT: patch
embed, cls token, interpolatable positional embeddings, 12 blocks
(width 384, heads 6), final LayerNorm; the feature is the cls token.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .clip import ResidualAttentionBlock

DINO_MEAN = (0.485, 0.456, 0.406)
DINO_STD = (0.229, 0.224, 0.225)


class DINOViT(nn.Module):
    """vit_small/16 by default."""
    width: int = 384
    heads: int = 6
    layers: int = 12
    patch: int = 16
    image_size: int = 224
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        """x: [b, H, W, 3] DINO-normalized. Returns cls features [b, width]."""
        b = x.shape[0]
        h = nn.Conv(self.width, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    name="patch_embed")(x)
        h = h.reshape(b, -1, self.width)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.width))
        h = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.width)), h],
                            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, (self.image_size // self.patch) ** 2 + 1,
                          self.width))
        h = h + pos
        for i in range(self.layers):
            h = ResidualAttentionBlock(self.heads, dtype=self.dtype,
                                       name=f"block_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        return h[:, 0]


def translate_dino(segs):
    """flax path -> torch DINO vit_small key."""
    from ..utils.ckpt import _LEAF
    out = []
    i = 0
    while i < len(segs):
        s = segs[i]
        if s == "patch_embed":
            out.append("patch_embed.proj"); i += 1; continue
        if s == "cls_token":
            return "cls_token"
        if s == "pos_embed":
            return "pos_embed"
        if s.startswith("block_"):
            out.append(f"blocks.{s.split('_')[1]}"); i += 1; continue
        if s == "attn":
            nxt = segs[i + 1]
            if nxt == "in_proj":
                return ".".join(out + ["attn.qkv", _LEAF[segs[i + 2]]])
            if nxt == "out_proj":
                out.append("attn.proj"); i += 2; continue
        if s == "ln_1":
            out.append("norm1"); i += 1; continue
        if s == "ln_2":
            out.append("norm2"); i += 1; continue
        if s == "mlp_fc":
            out.append("mlp.fc1"); i += 1; continue
        if s == "mlp_proj":
            out.append("mlp.fc2"); i += 1; continue
        if s in _LEAF:
            out.append(_LEAF[s]); i += 1; continue
        out.append(s)
        i += 1
    return ".".join(out)
