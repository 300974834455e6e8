"""UNetSD_TFT2V / UNetSD_VideoLCM — TF-T2V & VideoComposer compositional UNet.

TPU-native re-implementation of the reference models
(reference: tools/modules/unet/unet_tf2tv.py:188-843; unet_videolcm.py is
the same architecture plus a plumbed-but-disabled guidance-scale
embedding arg, :544/:713-714). Shares the T2V backbone and adds:

  * per-condition stems gated by ``video_compositions``: depthmap /
    motion / canny / mask / sketch / single_sketch / local_image — each a
    conv pyramid (in -> 4*concat_dim -> adaptive-pool res/2 -> stride-2 x2
    -> concat_dim at latent resolution) + Transformer_v2 temporal encoder,
    summed into a concat tensor channel-concatenated to x (reference
    :291-381 stems, :592-700 forward).
  * per-condition DropPath (misc_dropout) with forced all-zero/all-keep
    sample sets during training (reference :581-590; util.py DropPath
    :1700-1738 — no rescaling).
  * CLIP-image tokens via pre_image_condition (reference :280-284).
  * histogram context tokens via hist_context_embedding (reference
    :373-380, :745-755).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import MODEL
from .blocks import TimestepEmbedding, TransformerV2, sinusoidal_embedding
from .unet_i2vgen import adaptive_avg_pool2d
from .unet_t2v import UNetSD_T2VBase, filter_construct

# condition name -> stem input channels (reference :291-372)
STEM_IN_CHANNELS = {
    "depthmap": 1, "motion": 2, "canny": 1, "mask": 4, "sketch": 1,
    "single_sketch": 1, "local_image": 3,
}
# forward kwarg name per composition (reference forward signature :538-556)
COND_ARG = {"depthmap": "depth", "motion": "motion", "canny": "canny",
            "mask": "masked", "sketch": "sketch",
            "single_sketch": "single_sketch", "local_image": "local_image"}


class ConditionStem(nn.Module):
    """Conv pyramid to latent resolution + temporal Transformer_v2
    (reference :291-307 and analogous stems). Input [b, f, H, W, in_ch]
    (pixel space), output [b, f, H/8, W/8, concat_dim]."""
    concat_dim: int
    pool_hw: Tuple[int, int]
    depth: int = 1
    deterministic: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, cond):
        b, f = cond.shape[0], cond.shape[1]
        x = cond.reshape((b * f,) + cond.shape[2:])
        x = nn.Conv(self.concat_dim * 4, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.silu(x)
        x = adaptive_avg_pool2d(x, self.pool_hw)
        x = nn.Conv(self.concat_dim * 4, (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.silu(x)
        x = nn.Conv(self.concat_dim, (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype, name="conv3")(x)
        hh, ww, cd = x.shape[1], x.shape[2], x.shape[3]
        # temporal encoder over (b h w) f c
        x = x.reshape(b, f, hh, ww, cd).transpose(0, 2, 3, 1, 4)
        x = x.reshape(b * hh * ww, f, cd)
        x = TransformerV2(heads=2, dim_head=cd, depth=self.depth,
                          dropout_atte=0.05, dropout_ffn=0.05,
                          deterministic=self.deterministic, dtype=self.dtype,
                          name="after")(x)
        x = x.reshape(b, hh, ww, f, cd).transpose(0, 3, 1, 2, 4)
        return x


def misc_drop_multiplier(key, batch: int, p: float, zero, keep):
    """Per-sample DropPath multiplier with forced zero/keep sets
    (reference util.py DropPath:1700-1738 — no rescaling).

    Exact count-then-permute semantics: n ~ Binomial(batch, p) counted
    over the WHOLE batch (reference :1714), then n indices are chosen
    uniformly without replacement among the FREE indices (not keep, not
    zero, :1717-1726) and zeroed; forced-zero indices are always zeroed
    (zero wins over keep, :1727-1728)."""
    kn, kp = jax.random.split(key)
    n = jnp.sum(jax.random.uniform(kn, (batch,)) < p)
    free = ~(zero | keep)
    # random ranks over the free set: argsort of uniform scores is a
    # uniform permutation; non-free entries sort last (score=+inf)
    scores = jnp.where(free, jax.random.uniform(kp, (batch,)), jnp.inf)
    ranks = jnp.argsort(jnp.argsort(scores))
    dropped = free & (ranks < n)
    m = jnp.where(dropped, 0.0, 1.0)
    m = jnp.where(zero, 0.0, m)
    return m


class UNetSD_TFT2V(UNetSD_T2VBase):
    """TF-T2V / VideoComposer UNet; config surface mirrors the reference.

    ``video_compositions`` and ``resolution`` come from the model config
    (the reference passes the whole cfg object; we take the two fields)."""
    concat_dim: int = 8
    num_tokens: int = 4
    misc_dropout: float = 0.5
    p_all_zero: float = 0.1
    p_all_keep: float = 0.1
    video_compositions: Tuple[str, ...] = ("text", "mask")
    resolution: Tuple[int, int] = (448, 256)
    hist_dim: int = 156
    adapter_transformer_layers: int = 1
    use_guidance_embedding: bool = False  # VideoLCM t_w plumbing

    def setup(self):
        self._setup_embeddings()
        det = not self.training
        embed_dim = self.dim * 4

        if "image" in self.video_compositions:
            # CLIP image feature -> num_tokens context tokens (:280-284)
            self.pre_image_fc1 = nn.Dense(self.context_dim, dtype=self.dtype)
            self.pre_image_fc2 = nn.Dense(self.context_dim * self.num_tokens,
                                          dtype=self.dtype)
        if "histogram" in self.video_compositions:
            self.hist_fc1 = nn.Dense(embed_dim, dtype=self.dtype)
            self.hist_fc2 = nn.Dense(self.context_dim, dtype=self.dtype)
        if self.use_guidance_embedding:
            # VideoLCM guidance-scale embedding (unet_videolcm.py:544);
            # its addition into e is disabled in the reference (:713-714)
            self.guidance_embedding = TimestepEmbedding(embed_dim,
                                                        dtype=self.dtype)

        pool_hw = (int(self.resolution[1]) // 2, int(self.resolution[0]) // 2)
        stems = {}
        for comp, in_ch in STEM_IN_CHANNELS.items():
            if comp in self.video_compositions:
                stems[comp] = ConditionStem(
                    concat_dim=self.concat_dim, pool_hw=pool_hw,
                    depth=self.adapter_transformer_layers,
                    deterministic=det, dtype=self.dtype, name=f"stem_{comp}")
        self.stems = stems

        self._setup_backbone(self.in_dim + self.concat_dim)

    def __call__(self, x, t, y=None, depth=None, image=None, motion=None,
                 local_image=None, single_sketch=None, masked=None,
                 canny=None, sketch=None, histogram=None, fps=None,
                 zero_y=None, t_w=None, video_mask=None,
                 focus_present_mask=None, prob_focus_present=0.0,
                 misc_key=None, **kwargs):
        b, f, h, w, _ = x.shape
        training = self.training
        if misc_key is None:
            misc_key = self.make_rng("dropout") if training else \
                jax.random.PRNGKey(0)

        # all-zero / all-keep sample sets (reference :581-590)
        k_zero, k_keep, k_drop = jax.random.split(misc_key, 3)
        if training:
            zero = jax.random.uniform(k_zero, (b,)) < self.p_all_zero
            keep = (~zero) & (jax.random.uniform(k_keep, (b,)) < self.p_all_keep)
        else:
            zero = jnp.zeros((b,), bool)
            keep = jnp.zeros((b,), bool)

        def misc_dropout(v, key):
            if not training:
                return v
            m = misc_drop_multiplier(key, b, self.misc_dropout, zero, keep)
            return v * m.reshape((b,) + (1,) * (v.ndim - 1))

        conds = {"depthmap": depth, "motion": motion, "canny": canny,
                 "mask": masked, "sketch": sketch,
                 "single_sketch": single_sketch, "local_image": local_image}
        concat = jnp.zeros((b, f, h, w, self.concat_dim), jnp.float32)
        keys = jax.random.split(k_drop, len(STEM_IN_CHANNELS) + 3)
        for i, (comp, stem) in enumerate(self.stems.items()):
            cond = conds.get(comp)
            if cond is not None:
                concat = concat + misc_dropout(
                    stem(cond.astype(jnp.float32)), keys[i])

        emb = self.time_embed(sinusoidal_embedding(t, self.dim))
        if self.use_fps_condition and fps is not None:
            emb = emb + self.fps_embedding(sinusoidal_embedding(fps, self.dim))
        if self.use_guidance_embedding and t_w is not None:
            # plumbed but DISABLED add, matching the reference
            # (unet_videolcm.py:713-714); 0* keeps params materialized
            emb = emb + 0.0 * self.guidance_embedding(t_w)
        emb = jnp.repeat(emb, f, axis=0)

        # context: text (+ image tokens + histogram tokens)
        if y is not None:
            context = misc_dropout(y, keys[-1]) if training else y
        else:
            assert zero_y is not None
            context = jnp.broadcast_to(zero_y[:1], (b,) + zero_y.shape[1:])
        if image is not None and "image" in self.video_compositions:
            ic = nn.silu(self.pre_image_fc1(image))
            ic = self.pre_image_fc2(ic).reshape(b, self.num_tokens,
                                                self.context_dim)
            context = jnp.concatenate(
                [context, misc_dropout(ic, keys[-2]).astype(context.dtype)],
                axis=1)
        context = jnp.repeat(context, f, axis=0)

        if histogram is not None and "histogram" in self.video_compositions:
            hc = nn.silu(self.hist_fc1(histogram))
            hc = self.hist_fc2(hc).reshape(b, f, 1, self.context_dim)
            hc = misc_dropout(hc, keys[-3])
            hc = hc.reshape(b * f, 1, self.context_dim)
            context = jnp.concatenate([context, hc.astype(context.dtype)],
                                      axis=1)

        x = jnp.concatenate([x, concat.astype(x.dtype)], axis=-1)
        x = x.reshape(b * f, h, w, x.shape[-1])
        return self._run_backbone(x, emb, context, b, f, h, w)


class UNetSD_VideoLCM(UNetSD_TFT2V):
    """VideoLCM UNet: TFT2V + guidance-scale embedding param (the add is
    disabled, matching the reference unet_videolcm.py:713-714)."""
    use_guidance_embedding: bool = True


@MODEL.register_function("UNetSD_TFT2V")
def build_unet_tft2v(config=None, **cfg):
    if config is not None:  # reference passes the whole cfg object
        cfg.setdefault("video_compositions",
                       config.get("video_compositions", ("text", "mask")))
        cfg.setdefault("resolution", config.get("resolution", (448, 256)))
    return filter_construct(UNetSD_TFT2V, cfg)


@MODEL.register_function("UNetSD_VideoLCM")
def build_unet_videolcm(config=None, **cfg):
    if config is not None:
        cfg.setdefault("video_compositions",
                       config.get("video_compositions", ("text", "mask")))
        cfg.setdefault("resolution", config.get("resolution", (448, 256)))
    return filter_construct(UNetSD_VideoLCM, cfg)
