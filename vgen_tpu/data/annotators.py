"""Condition extractors (annotators) for VideoComposer-style control.

Equivalent of the reference annotator package (reference:
tools/annotator/ — CannyDetector canny/__init__.py:7-50, MiDaS DPT depth
depth/__init__.py:162-309, pidinet+sketch-simplification GAN sketch/,
Palette histogram histogram/palette.py).

Status:
  * canny — cv2-backed, full parity (host-side, like the reference).
  * midas_depth / pidinet_sketch — full flax ports (models/
    annotator_nets.py) that load the reference's torch weights from
    ``models/`` (incl. the pidinet pixel-difference->vanilla-conv fold)
    and raise AnnotatorUnavailable when weights are absent (engines
    skip those conditions with a warning, like the reference requires
    downloads).
  * palette histogram — LAB color histogram over a fixed palette (the
    reference wires it only in commented-out training code).
"""

from __future__ import annotations

import logging
import os
import random
from typing import Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


class AnnotatorUnavailable(RuntimeError):
    """Raised when a condition extractor's backbone/weights are absent."""


def canny(frame_u8: np.ndarray, low: Optional[int] = None,
          high: Optional[int] = None, random_thresholds: bool = False,
          rng: Optional[random.Random] = None) -> np.ndarray:
    """Canny edges [h, w] uint8 (reference CannyDetector: random
    thresholds during training, fixed at inference)."""
    if cv2 is None:
        raise AnnotatorUnavailable("cv2 missing")
    if random_thresholds:
        rng = rng or random
        low = rng.randint(50, 150)
        high = rng.randint(int(low * 1.5), min(int(low * 3), 255))
    return cv2.Canny(frame_u8, low or 100, high or 200)


_NET_CACHE: dict = {}

# carv4 fold indices (reference pidinet.py:346-369 convert_pdc)
_AD_PERM = [3, 0, 1, 6, 4, 2, 7, 8, 5]
_RD_POS = [0, 2, 4, 10, 14, 20, 22, 24]
_RD_NEG = [6, 7, 8, 11, 13, 16, 17, 18]


def _convert_pidinet_weights(sd: dict) -> dict:
    """Fold pixel-difference conv weights into vanilla convs
    (numpy port of reference pidinet.py:346-410 convert_pidinet/
    convert_pdc, carv4 layer ops)."""
    from ..models.annotator_nets import CARV4

    names = ["init_block.weight"] + [
        f"block{s}_{j}.conv1.weight"
        for s in (1, 2, 3, 4) for j in ((1, 2, 3) if s == 1 else (1, 2, 3, 4))]
    out = dict(sd)
    for op, name in zip(CARV4, names):
        w = sd[name]
        o, c = w.shape[:2]
        flat = w.reshape(o, c, -1)
        if op == "cd":
            flat = flat.copy()
            flat[:, :, 4] = flat[:, :, 4] - flat.sum(axis=2)
            out[name] = flat.reshape(w.shape)
        elif op == "ad":
            out[name] = (flat - flat[:, :, _AD_PERM]).reshape(w.shape)
        elif op == "rd":
            buf = np.zeros((o, c, 25), w.dtype)
            buf[:, :, _RD_POS] = flat[:, :, 1:]
            buf[:, :, _RD_NEG] = -flat[:, :, 1:]
            out[name] = buf.reshape(o, c, 5, 5)
    return out


def _get_net(kind: str, weights_path: str):
    """Build + weight-load a flax annotator net, cached; returns a jitted
    ``fn(x_nhwc) -> y_nhw1``."""
    import jax
    import jax.numpy as jnp

    from ..models import annotator_nets as nets
    from ..utils.ckpt import load_torch_checkpoint, remap_state_dict
    from .annotator_keys import (translate_midas, translate_pidinet,
                                 translate_sketch_gan)

    key = (kind, weights_path)
    if key in _NET_CACHE:
        return _NET_CACHE[key]
    if not os.path.exists(weights_path):
        raise AnnotatorUnavailable(
            f"{kind} weights not found at {weights_path}")
    sd = load_torch_checkpoint(weights_path)
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    try:
        if kind == "pidinet":
            sd = _convert_pidinet_weights(sd)
            model, translate = nets.PiDiNetConverted(), translate_pidinet
            probe = jnp.zeros((1, 32, 32, 3))
        elif kind == "sketch_gan":
            model, translate = nets.SketchSimplification(), \
                translate_sketch_gan
            probe = jnp.zeros((1, 32, 32, 1))
        elif kind == "midas":
            model, translate = nets.MiDaS(), translate_midas
            probe = jnp.zeros((1, 32, 32, 3))
        else:  # pragma: no cover
            raise ValueError(kind)
        params = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), probe))
        params = remap_state_dict(params, sd, translate, kind, strict=True)
    except (KeyError, ValueError) as e:
        # wrong-architecture / corrupt checkpoint: skip the condition
        # (with a warning) instead of killing the whole run
        raise AnnotatorUnavailable(
            f"{kind} checkpoint at {weights_path} does not match the "
            f"expected architecture: {e}") from e
    fn = jax.jit(model.apply)
    _NET_CACHE[key] = fn, params
    return fn, params


def midas_depth(frames_u8: np.ndarray, resolution: Tuple[int, int],
                clamp: float = 10.0, std: float = 20.0,
                weights_path: str = "models/midas_v3_dpt_large.pth"):
    """MiDaS v3 DPT depth maps [f, h, w, 1], normalized like the
    reference vcomposer pipeline ((depth / depth_std).clamp(0,
    depth_clamp), input scaled to [-1, 1]; reference
    inference_tft2v_vcomposer_entrance.py:407-408)."""
    import jax.numpy as jnp

    fn, params = _get_net("midas", weights_path)
    w, h = resolution
    # MiDaS needs h, w divisible by 32
    hh, ww = (h // 32) * 32, (w // 32) * 32
    x = np.stack([cv2.resize(fr, (ww, hh)) for fr in frames_u8])
    x = x.astype(np.float32) / 127.5 - 1.0
    depth = np.asarray(fn(params, jnp.asarray(x)))
    depth = np.clip(depth / std, 0, clamp)
    if (hh, ww) != (h, w):
        depth = np.stack([cv2.resize(d, (w, h))[..., None]
                          for d in depth[..., 0]])
    return depth


def pidinet_sketch(frames_u8: np.ndarray, resolution: Tuple[int, int],
                   mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                   weights_path: str = "models/table5_pidinet.pth",
                   cleaner_path: str = "models/sketch_simplification_gan.pth"):
    """pidinet edges + sketch-simplification GAN [f, h, w, 1]
    (reference vcomposer: sketch = 1 - cleaner(1 - pidinet(norm(x))),
    inference_tft2v_vcomposer_entrance.py:416-417)."""
    import jax.numpy as jnp

    pidi_fn, pidi_params = _get_net("pidinet", weights_path)
    gan_fn, gan_params = _get_net("sketch_gan", cleaner_path)
    w, h = resolution
    # both nets want h, w divisible by 8
    hh, ww = (h // 8) * 8, (w // 8) * 8
    x = np.stack([cv2.resize(fr, (ww, hh)) for fr in frames_u8])
    x = (x.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)
    edges = np.asarray(pidi_fn(pidi_params, jnp.asarray(x)))
    sketch = 1.0 - np.asarray(gan_fn(gan_params, jnp.asarray(1.0 - edges)))
    if (hh, ww) != (h, w):
        sketch = np.stack([cv2.resize(s, (w, h))[..., None]
                           for s in sketch[..., 0]])
    return sketch


# --------------------------------------------------------------------------- #
# palette histogram (reference tools/annotator/histogram/palette.py)
# --------------------------------------------------------------------------- #
class Palette:
    """LAB color-codebook histogram: soft-assign pixels to a fixed
    palette with a Gaussian kernel, yielding a per-frame histogram vector
    (the reference's 156-dim `hist_dim` condition)."""

    def __init__(self, num_colors: int = 156, sigma: float = 10.0,
                 seed: int = 0):
        rng = np.random.RandomState(seed)
        # deterministic LAB-space codebook spanning the gamut
        L = rng.uniform(0, 100, num_colors)
        a = rng.uniform(-90, 90, num_colors)
        b = rng.uniform(-90, 90, num_colors)
        self.codebook = np.stack([L, a, b], axis=1).astype(np.float32)
        self.sigma = sigma

    def histogram(self, frame_u8: np.ndarray) -> np.ndarray:
        if cv2 is None:
            raise AnnotatorUnavailable("cv2 missing")
        lab = cv2.cvtColor(frame_u8, cv2.COLOR_RGB2LAB).astype(np.float32)
        lab = lab.reshape(-1, 3)
        # subsample for speed
        if len(lab) > 4096:
            lab = lab[:: len(lab) // 4096]
        d2 = ((lab[:, None, :] - self.codebook[None]) ** 2).sum(-1)
        w = np.exp(-d2 / (2 * self.sigma ** 2))
        hist = w.sum(axis=0)
        total = hist.sum()
        return hist / total if total > 0 else hist
