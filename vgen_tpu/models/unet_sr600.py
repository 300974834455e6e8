"""UNetSD_SR600 — the 1280x720 video super-resolution UNet.

TPU-native re-implementation of the reference SR model
(reference: tools/modules/unet/unet_sr600.py:52-389). Same T2V-style
backbone with two differences:

  * UpsampleSR600: nearest-2x upsample that trims one row top+bottom to
    match the 720p odd latent grid (reference :444-483 util variant,
    unet_sr600.py:206).
  * FreeU-style decoder conditioning (reference :276-290): the first two
    decoder blocks scale the first half of the trunk channels by 1.1/1.2
    and low-pass-boost the skip connection through an FFT Fourier filter
    (threshold 1, scales 0.6/0.4) — reference Fourier_filter :30-49.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import MODEL
from .blocks import Upsample, sinusoidal_embedding
from .unet_t2v import UNetSD_T2VBase, filter_construct


def fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """Scale the lowest frequencies of x by ``scale`` (reference
    unet_sr600.py:30-49). x: [n, h, w, c]; FFT over (h, w), fp32."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    freq = jnp.fft.fftn(x32, axes=(1, 2))
    freq = jnp.fft.fftshift(freq, axes=(1, 2))
    n, h, w, c = x.shape
    crow, ccol = h // 2, w // 2
    mask = jnp.ones((1, h, w, 1), jnp.float32)
    mask = mask.at[:, crow - threshold:crow + threshold,
                   ccol - threshold:ccol + threshold, :].set(scale)
    freq = freq * mask
    freq = jnp.fft.ifftshift(freq, axes=(1, 2))
    out = jnp.fft.ifftn(freq, axes=(1, 2)).real
    return out.astype(dtype)


class UNetSD_SR600(UNetSD_T2VBase):
    """Video SR UNet; backbone shared with T2V, SR600 upsample + FreeU."""

    upsample_trim: bool = True      # trim H by 1 each side after 2x
    downsample_pad_h: bool = True   # pad H by 2 on the way down

    def setup(self):
        from .blocks import TimestepEmbedding
        self.time_embed = TimestepEmbedding(self.dim * 4, dtype=self.dtype)
        self._setup_backbone(self.in_dim)

    def __call__(self, x, t, y, x_lr=None, fps=None, video_mask=None,
                 focus_present_mask=None, prob_focus_present=0.0, **kwargs):
        b, f, h, w, _ = x.shape
        emb = self.time_embed(sinusoidal_embedding(t, self.dim))
        emb = jnp.repeat(emb, f, axis=0)
        context = jnp.repeat(y, f, axis=0)
        x = x.reshape(b * f, h, w, x.shape[-1])

        def skip_hook(idx, xx, skip):
            # FreeU boosts on the first two decoder blocks (reference
            # :276-290)
            if idx == 0:
                c = xx.shape[-1]
                xx = jnp.concatenate([xx[..., :c // 2] * 1.1,
                                      xx[..., c // 2:]], axis=-1)
                skip = fourier_filter(skip, threshold=1, scale=0.6)
            elif idx == 1:
                c = xx.shape[-1]
                xx = jnp.concatenate([xx[..., :c // 2] * 1.2,
                                      xx[..., c // 2:]], axis=-1)
                skip = fourier_filter(skip, threshold=1, scale=0.4)
            return xx, skip

        return self._run_backbone(x, emb, context, b, f, h, w,
                                  skip_hook=skip_hook)


@MODEL.register_function("UNetSD_SR600")
def build_unet_sr600(**cfg):
    return filter_construct(UNetSD_SR600, cfg)
