"""Image/video preprocessing transforms (host-side numpy/PIL).

Equivalent of the reference PIL transform pipeline
(reference: utils/transforms.py:101-352). Operates on numpy uint8 frames
[f, h, w, 3]; outputs normalized float32 arrays ready for device transfer
(NHWC — no CHW permute, TPU is channels-last).
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image


def _resize_frames(frames: np.ndarray, size_hw: Tuple[int, int],
                   resample=Image.BILINEAR) -> np.ndarray:
    h, w = size_hw
    out = np.stack([np.asarray(Image.fromarray(f).resize((w, h), resample))
                    for f in frames])
    return out


def center_crop_wide(frames: np.ndarray, size_wh: Tuple[int, int],
                     resample=Image.BOX) -> np.ndarray:
    """Aspect-preserving resize then center crop to (w, h)
    (reference CenterCropWide, utils/transforms.py:163-184)."""
    tw, th = size_wh
    f, h, w = frames.shape[:3]
    scale = max(tw / w, th / h)
    nw, nh = round(w * scale), round(h * scale)
    frames = _resize_frames(frames, (nh, nw), resample)
    x0 = (nw - tw) // 2
    y0 = (nh - th) // 2
    return frames[:, y0:y0 + th, x0:x0 + tw]


def center_crop(frames: np.ndarray, size: int) -> np.ndarray:
    f, h, w = frames.shape[:3]
    s = size / min(h, w)
    frames = _resize_frames(frames, (round(h * s), round(w * s)))
    h, w = frames.shape[1:3]
    y0, x0 = (h - size) // 2, (w - size) // 2
    return frames[:, y0:y0 + size, x0:x0 + size]


def random_crop(frames: np.ndarray, size_wh: Tuple[int, int],
                rng: Optional[random.Random] = None) -> np.ndarray:
    rng = rng or random
    tw, th = size_wh
    f, h, w = frames.shape[:3]
    scale = max(tw / w, th / h)
    frames = _resize_frames(frames, (round(h * scale), round(w * scale)))
    h, w = frames.shape[1:3]
    y0 = rng.randint(0, max(h - th, 0)) if h > th else 0
    x0 = rng.randint(0, max(w - tw, 0)) if w > tw else 0
    return frames[:, y0:y0 + th, x0:x0 + tw]


def random_hflip(frames: np.ndarray, p: float = 0.5,
                 rng: Optional[random.Random] = None) -> np.ndarray:
    rng = rng or random
    if rng.random() < p:
        return frames[:, :, ::-1].copy()
    return frames


def to_tensor(frames: np.ndarray) -> np.ndarray:
    """uint8 [f,h,w,3] -> float32 [0,1]."""
    return frames.astype(np.float32) / 255.0


def normalize(x: np.ndarray, mean: Sequence[float],
              std: Sequence[float]) -> np.ndarray:
    """Clamp to [0,1] then (x-mean)/std (reference Normalize clamps first,
    utils/transforms.py:340-352)."""
    x = np.clip(x, 0.0, 1.0)
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def video_transform(frames_u8: np.ndarray, resolution: Tuple[int, int],
                    mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)) -> np.ndarray:
    """The standard train/infer video pipeline: CenterCropWide ->
    ToTensor -> Normalize. resolution is (w, h) like the configs."""
    frames = center_crop_wide(frames_u8, tuple(resolution))
    return normalize(to_tensor(frames), mean, std)


def vit_transform(frame_u8: np.ndarray, vit_resolution=(224, 224),
                  mean=(0.48145466, 0.4578275, 0.40821073),
                  std=(0.26862954, 0.26130258, 0.27577711)) -> np.ndarray:
    """CLIP-space preprocessing of a single reference frame."""
    frames = center_crop_wide(frame_u8[None], tuple(vit_resolution),
                              resample=Image.BICUBIC)
    return normalize(to_tensor(frames), mean, std)[0]
