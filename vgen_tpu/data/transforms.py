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


def resize(frames: np.ndarray, size, resample=Image.BILINEAR) -> np.ndarray:
    """Resize every frame to ``size`` (int -> square)
    (reference Resize, utils/transforms.py:31-43)."""
    if isinstance(size, int):
        size = (size, size)
    return _resize_frames(frames, (size[1], size[0]), resample)


def rescale(frames: np.ndarray, size: int = 256,
            resample=Image.BILINEAR) -> np.ndarray:
    """Short-side resize preserving aspect (reference Rescale,
    utils/transforms.py:45-56)."""
    h, w = frames.shape[1:3]
    scale = size / min(w, h)
    return _resize_frames(frames, (round(h * scale), round(w * scale)),
                          resample)


def _fast_short_side(frames: np.ndarray, size_short: int) -> np.ndarray:
    """Halve with BOX while short side >= 2*target, then BICUBIC to the
    target short side (reference CenterCropV2/ResizeRandomCrop pattern,
    utils/transforms.py:80-85,146-152)."""
    while min(frames.shape[1:3]) >= 2 * size_short:
        h, w = frames.shape[1:3]
        frames = _resize_frames(frames, (h // 2, w // 2), Image.BOX)
    h, w = frames.shape[1:3]
    scale = size_short / min(w, h)
    return _resize_frames(frames, (round(scale * h), round(scale * w)),
                          Image.BICUBIC)


def center_crop_v2(frames: np.ndarray, size: int) -> np.ndarray:
    """BOX-halving fast path + BICUBIC + center crop (reference
    CenterCropV2, utils/transforms.py:144-160)."""
    frames = _fast_short_side(frames, size)
    h, w = frames.shape[1:3]
    y0, x0 = (h - size) // 2, (w - size) // 2
    return frames[:, y0:y0 + size, x0:x0 + size]


def resize_random_crop(frames: np.ndarray, size: int = 256,
                       size_short: int = 292,
                       rng: Optional[random.Random] = None,
                       return_box: bool = False):
    """Short-side resize then random square crop; ``return_box`` also
    returns the crop box for paired streams (reference ResizeRandomCrop /
    ExtractResizeRandomCrop, utils/transforms.py:70-125)."""
    rng = rng or random
    frames = _fast_short_side(frames, size_short)
    h, w = frames.shape[1:3]
    x1 = rng.randint(0, w - size)
    y1 = rng.randint(0, h - size)
    out = frames[:, y1:y1 + size, x1:x1 + size]
    if return_box:
        return out, [x1, y1, x1 + size, y1 + size]
    return out


def resize_assign_crop(frames: np.ndarray, box, size: int = 256,
                       size_short: int = 292) -> np.ndarray:
    """Apply a crop box from resize_random_crop to a paired stream, then
    resize to (size, size) (reference ExtractResizeAssignCrop,
    utils/transforms.py:127-142)."""
    frames = _fast_short_side(frames, size_short)
    x1, y1, x2, y2 = box
    frames = frames[:, y1:y2, x1:x2]
    return _resize_frames(frames, (size, size), Image.BILINEAR)


def random_resized_crop(frames: np.ndarray, size: int = 224,
                        min_area: float = 0.4,
                        ratio=(3.0 / 4.0, 4.0 / 3.0),
                        rng: Optional[random.Random] = None) -> np.ndarray:
    """Area/aspect-jittered crop + resize (reference RandomCropV2,
    utils/transforms.py:214-260; torchvision RandomResizedCrop params)."""
    import math

    rng = rng or random
    h, w = frames.shape[1:3]
    area = h * w
    for _ in range(10):
        target_area = rng.uniform(min_area, 1.0) * area
        aspect = math.exp(rng.uniform(math.log(ratio[0]), math.log(ratio[1])))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            i = rng.randint(0, h - ch)
            j = rng.randint(0, w - cw)
            break
    else:
        in_ratio = w / h
        if in_ratio < min(ratio):
            cw, ch = w, int(round(w / min(ratio)))
        elif in_ratio > max(ratio):
            ch, cw = h, int(round(h * max(ratio)))
        else:
            cw, ch = w, h
        i, j = (h - ch) // 2, (w - cw) // 2
    crop = frames[:, i:i + ch, j:j + cw]
    return _resize_frames(crop, (size, size), Image.BILINEAR)


def gaussian_blur(frames: np.ndarray, sigmas=(0.1, 2.0), p: float = 0.5,
                  rng: Optional[random.Random] = None) -> np.ndarray:
    """PIL GaussianBlur with random sigma (reference GaussianBlur,
    utils/transforms.py:271-281)."""
    from PIL import ImageFilter

    rng = rng or random
    if rng.random() >= p:
        return frames
    sigma = rng.uniform(*sigmas)
    return np.stack([np.asarray(Image.fromarray(f).filter(
        ImageFilter.GaussianBlur(radius=sigma))) for f in frames])


def _blend(a: np.ndarray, b: np.ndarray, f: float) -> np.ndarray:
    return np.clip(a * f + b * (1.0 - f), 0, 255).astype(np.uint8)


def _grayscale(frames: np.ndarray) -> np.ndarray:
    g = (frames @ np.asarray([0.299, 0.587, 0.114], np.float32))
    return np.repeat(g[..., None], 3, axis=-1)


def color_jitter(frames: np.ndarray, brightness: float = 0.4,
                 contrast: float = 0.4, saturation: float = 0.4,
                 hue: float = 0.1, p: float = 0.5,
                 rng: Optional[random.Random] = None) -> np.ndarray:
    """Brightness/contrast/saturation/hue jitter in random order,
    torchvision-compatible math (reference ColorJitter,
    utils/transforms.py:283-311)."""
    import colorsys  # noqa: F401  (hue path uses HSV via PIL)

    rng = rng or random
    if rng.random() >= p:
        return frames
    b = rng.uniform(max(0, 1 - brightness), 1 + brightness)
    c = rng.uniform(max(0, 1 - contrast), 1 + contrast)
    s = rng.uniform(max(0, 1 - saturation), 1 + saturation)
    hshift = rng.uniform(-hue, hue)

    def adj_brightness(x):
        return _blend(x.astype(np.float32), np.zeros_like(x, np.float32), b)

    def adj_contrast(x):
        mean = _grayscale(x.astype(np.float32)).mean()
        return _blend(x.astype(np.float32), np.full_like(
            x, mean, np.float32), c)

    def adj_saturation(x):
        return _blend(x.astype(np.float32), _grayscale(x.astype(np.float32)),
                      s)

    def adj_hue(x):
        out = []
        for fr in x:
            hsv = np.asarray(Image.fromarray(fr).convert("HSV"),
                             np.uint8).copy()
            hsv[..., 0] = (hsv[..., 0].astype(np.int32)
                           + int(round(hshift * 255))) % 256
            out.append(np.asarray(Image.fromarray(hsv, "HSV").convert("RGB")))
        return np.stack(out)

    ops = [adj_brightness, adj_contrast, adj_saturation, adj_hue]
    rng.shuffle(ops)
    for op in ops:
        frames = op(frames)
    return frames


def random_gray(frames: np.ndarray, p: float = 0.2,
                rng: Optional[random.Random] = None) -> np.ndarray:
    """Probabilistic grayscale (reference RandomGray,
    utils/transforms.py:313-321)."""
    rng = rng or random
    if rng.random() < p:
        return _grayscale(frames.astype(np.float32)).astype(frames.dtype)
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
