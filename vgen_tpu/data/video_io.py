"""Video/image writers and readers (host-side).

Equivalent of the reference's ffmpeg-subprocess writers
(reference: utils/video_op.py:30-310). This environment has no ffmpeg
binary, so the writer chain is: ffmpeg subprocess (when present, same
x264/crf settings as the reference) -> cv2.VideoWriter (mp4v) -> PIL GIF.
All writers retry like the reference (video_op.py:87-106).
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
import tempfile
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from PIL import Image, ImageDraw


def tensor_to_uint8(video: np.ndarray, mean=(0.5, 0.5, 0.5),
                    std=(0.5, 0.5, 0.5)) -> np.ndarray:
    """[f, h, w, 3] float (normalized) -> uint8 RGB frames."""
    video = np.asarray(video, dtype=np.float32)
    video = video * np.asarray(std) + np.asarray(mean)
    return (np.clip(video, 0.0, 1.0) * 255).round().astype(np.uint8)


def _write_ffmpeg(frames: np.ndarray, path: str, fps: int) -> bool:
    if shutil.which("ffmpeg") is None:
        return False
    with tempfile.TemporaryDirectory() as td:
        for i, fr in enumerate(frames):
            Image.fromarray(fr).save(os.path.join(td, f"{i:06d}.png"))
        cmd = ["ffmpeg", "-y", "-f", "image2", "-loglevel", "quiet",
               "-framerate", str(fps), "-i", os.path.join(td, "%06d.png"),
               "-vcodec", "libx264", "-crf", "17", "-pix_fmt", "yuv420p",
               path]
        return subprocess.run(cmd, check=False).returncode == 0


def _write_cv2(frames: np.ndarray, path: str, fps: int) -> bool:
    if cv2 is None:
        return False
    h, w = frames.shape[1:3]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(path, fourcc, fps, (w, h))
    if not writer.isOpened():
        return False
    for fr in frames:
        writer.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
    writer.release()
    return os.path.exists(path) and os.path.getsize(path) > 0


def _write_gif(frames: np.ndarray, path: str, fps: int) -> bool:
    gif_path = os.path.splitext(path)[0] + ".gif"
    imgs = [Image.fromarray(fr) for fr in frames]
    imgs[0].save(gif_path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / max(fps, 1)), loop=0)
    return True


def save_video(frames_or_tensor, path: str, fps: int = 8,
               mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
               retries: int = 5) -> Optional[str]:
    """Write [f,h,w,3] video (uint8, or normalized float which gets
    denormalized). Returns the actual path written or None."""
    frames = np.asarray(frames_or_tensor)
    if frames.dtype != np.uint8:
        frames = tensor_to_uint8(frames, mean, std)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    for attempt in range(retries):
        try:
            if _write_ffmpeg(frames, path, fps):
                return path
            if path.endswith(".mp4") and _write_cv2(frames, path, fps):
                return path
            if _write_gif(frames, path, fps):
                return os.path.splitext(path)[0] + ".gif"
        except Exception as e:  # noqa: BLE001 (reference retries any error)
            logger.warning("save_video attempt %d failed: %s", attempt, e)
    logger.error("save_video failed after %d retries: %s", retries, path)
    return None


def gen_text_image(text: str, width: int, height: int = 60) -> np.ndarray:
    """Rasterize a caption strip (reference utils/video_op.py:30-44)."""
    img = Image.new("RGB", (width, height), (255, 255, 255))
    draw = ImageDraw.Draw(img)
    # wrap text crudely at ~width/7 chars per line
    per_line = max(8, width // 7)
    lines = [text[i:i + per_line] for i in range(0, len(text), per_line)][:3]
    for i, line in enumerate(lines):
        draw.text((4, 4 + i * 18), line, fill=(0, 0, 0))
    return np.asarray(img)


def save_video_with_caption(frames_or_tensor, caption: str, path: str,
                            fps: int = 8, mean=(0.5, 0.5, 0.5),
                            std=(0.5, 0.5, 0.5)) -> Optional[str]:
    """Video with a rasterized caption strip on top (the reference's
    labeled training-visualization grids, utils/video_op.py:47-106)."""
    frames = np.asarray(frames_or_tensor)
    if frames.dtype != np.uint8:
        frames = tensor_to_uint8(frames, mean, std)
    strip = gen_text_image(caption, frames.shape[2])
    strip = np.repeat(strip[None], frames.shape[0], axis=0)
    framed = np.concatenate([strip, frames], axis=1)
    return save_video(framed, path, fps)


def read_video_frames(path: str, max_frames: int = -1,
                      sample_fps: Optional[float] = None) -> np.ndarray:
    """Decode a video to [f, h, w, 3] uint8 RGB (the reference's dataset
    decode path, tools/datasets/video_dataset.py:62-94). Uses the native
    C++ pipeline (native/video_decode.cc — whole-video decode in one
    GIL-free call) when built, else Python cv2."""
    from .native_decode import read_video_frames_native
    try:
        frames = read_video_frames_native(path, max_frames, sample_fps)
        if frames is not None:
            return frames
    except IOError:
        pass  # fall through to cv2 (codec coverage can differ)
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    stride = max(1, round(src_fps / sample_fps)) if sample_fps else 1
    frames = []
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx % stride == 0:
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            if 0 < max_frames <= len(frames):
                break
        idx += 1
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    return np.stack(frames)
