"""Datasets: video/image lists with captions, decoded host-side.

TPU-native equivalent of the reference dataset classes
(reference: tools/datasets/video_dataset.py:15-116, image_dataset.py:14+,
video_custom_dataset.py, image_custom_dataset.py). Same list format
("relpath|||caption" lines), same fps-ratio stride sampling, temporal
crop, zero-pad to max_frames, zero-tensor fallback on read failure —
but built as plain-Python iterables feeding a prefetching loader
(no torch DataLoader; batches are numpy, transferred to device whole).

Returns per sample: (ref_frame [h,w,3], vit_frame [224,224,3],
video [f,h,w,3], caption:str, key:str) — NHWC versions of the reference
tuple (video_dataset.py:96-116).
"""

from __future__ import annotations

import logging
import os
import queue
import random
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..core.registry import DATASETS
from . import transforms as T
from .video_io import read_video_frames

logger = logging.getLogger(__name__)


def _parse_list_files(data_list: Sequence[str],
                      data_dir_list: Sequence[str]) -> List[Tuple[str, str]]:
    items = []
    for lst, root in zip(data_list, data_dir_list):
        if not os.path.exists(lst):
            logger.warning("data list %s missing — skipped", lst)
            continue
        with open(lst) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if "|||" in line:
                    rel, caption = line.split("|||", 1)
                else:
                    rel, caption = line, ""
                items.append((os.path.join(root, rel.strip()), caption.strip()))
    return items


class _BaseDataset:
    def __init__(self, data_list, data_dir_list=None, resolution=(448, 256),
                 vit_resolution=(224, 224), max_words=1000, mean=(0.5,) * 3,
                 std=(0.5,) * 3, **kwargs):
        if data_dir_list is None:
            data_dir_list = [""] * len(data_list)
        self.items = _parse_list_files(data_list, data_dir_list)
        self.resolution = tuple(resolution)
        self.vit_resolution = tuple(vit_resolution)
        self.max_words = max_words
        self.mean, self.std = mean, std

    def __len__(self):
        return len(self.items)

    def _zero_sample(self, max_frames: int):
        w, h = self.resolution
        vw, vh = self.vit_resolution
        return (np.zeros((h, w, 3), np.float32),
                np.zeros((vh, vw, 3), np.float32),
                np.zeros((max_frames, h, w, 3), np.float32),
                "", "bad_sample")


@DATASETS.register_class()
class VideoDataset(_BaseDataset):
    """Video list dataset with fps-ratio stride sampling and retries
    (reference video_dataset.py:15-116)."""

    def __init__(self, *args, sample_fps: int = 8, max_frames: int = 16,
                 get_first_frame: bool = True, retries: int = 5, **kwargs):
        super().__init__(*args, **kwargs)
        self.sample_fps = sample_fps
        self.max_frames = max_frames
        self.get_first_frame = get_first_frame
        self.retries = retries

    def __getitem__(self, idx: int):
        path, caption = self.items[idx % max(len(self.items), 1)] \
            if self.items else (None, "")
        for _ in range(self.retries):
            try:
                return self._load(path, caption)
            except Exception as e:  # noqa: BLE001 (reference retries any)
                logger.warning("video read failed (%s): %s", path, e)
        return self._zero_sample(self.max_frames)

    def _load(self, path, caption):
        frames_u8 = read_video_frames(path, max_frames=-1,
                                      sample_fps=self.sample_fps)
        f = len(frames_u8)
        if f > self.max_frames:  # random temporal crop (reference :80-87)
            start = random.randint(0, f - self.max_frames)
            frames_u8 = frames_u8[start:start + self.max_frames]

        # reference frame: first or middle (reference :96-100)
        ref_idx = 0 if self.get_first_frame else len(frames_u8) // 2
        vit_frame = T.vit_transform(frames_u8[ref_idx], self.vit_resolution)

        video = T.video_transform(frames_u8, self.resolution, self.mean,
                                  self.std)
        ref_frame = video[ref_idx].copy()
        if len(video) < self.max_frames:  # zero-pad (reference :96-106)
            pad = np.zeros((self.max_frames - len(video),) + video.shape[1:],
                           np.float32)
            video = np.concatenate([video, pad], axis=0)
        key = os.path.basename(path or "")
        return ref_frame, vit_frame, video, caption[: self.max_words], key


@DATASETS.register_class()
class VideoCustomDataset(VideoDataset):
    """DreamVideo variant: adds random-frame selection
    (reference video_custom_dataset.py)."""

    def get_random_frame(self, idx: int):
        _, _, video, caption, key = self[idx]
        fi = random.randint(0, len(video) - 1)
        return video[fi], caption, key


@DATASETS.register_class()
class ImageDataset(_BaseDataset):
    """Single-frame dataset for joint image/video training
    (reference image_dataset.py). Video tensor has f=1."""

    def __init__(self, *args, **kwargs):
        kwargs.pop("sample_fps", None)
        kwargs.pop("max_frames", None)
        super().__init__(*args, **kwargs)

    def __getitem__(self, idx: int):
        from PIL import Image as PILImage
        path, caption = self.items[idx % max(len(self.items), 1)] \
            if self.items else (None, "")
        try:
            img = np.asarray(PILImage.open(path).convert("RGB"))
            vit_frame = T.vit_transform(img, self.vit_resolution)
            video = T.video_transform(img[None], self.resolution, self.mean,
                                      self.std)
            return video[0], vit_frame, video, caption[: self.max_words], \
                os.path.basename(path)
        except Exception as e:  # noqa: BLE001
            logger.warning("image read failed (%s): %s", path, e)
            return self._zero_sample(1)


@DATASETS.register_class()
class ImageCustomDataset(ImageDataset):
    """DreamVideo image variant with optional subject masks for masked
    diffusion (reference image_custom_dataset.py)."""

    def __init__(self, *args, mask_dir: Optional[str] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.mask_dir = mask_dir

    def __getitem__(self, idx: int):
        ref_frame, vit_frame, video, caption, key = super().__getitem__(idx)
        mask = np.ones_like(video[..., :1])
        if self.mask_dir:
            from PIL import Image as PILImage
            mpath = os.path.join(self.mask_dir, os.path.splitext(key)[0] + ".png")
            if os.path.exists(mpath):
                m = np.asarray(PILImage.open(mpath).convert("L"),
                               np.float32) / 255.0
                m = T.center_crop_wide(
                    np.repeat(m[None, :, :, None], 3, -1).astype(np.uint8),
                    self.resolution)[..., :1]
                mask = np.repeat(m.astype(np.float32), len(video), axis=0)
        return ref_frame, vit_frame, video, caption, key, mask


@DATASETS.register_class()
class SyntheticVideoDataset:
    """Deterministic random-video dataset for smoke tests and benchmarks
    (no counterpart in the reference, which has no test data either)."""

    def __init__(self, resolution=(64, 64), vit_resolution=(224, 224),
                 max_frames: int = 4, length: int = 64, seed: int = 0,
                 **kwargs):
        self.resolution = tuple(resolution)
        self.vit_resolution = tuple(vit_resolution)
        self.max_frames = max_frames
        self.length = length
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int):
        rng = np.random.RandomState(self.seed + idx)
        w, h = self.resolution
        vw, vh = self.vit_resolution
        video = rng.randn(self.max_frames, h, w, 3).astype(np.float32) * 0.2
        return (video[0], rng.randn(vh, vw, 3).astype(np.float32) * 0.2,
                video, f"synthetic caption {idx}", f"syn_{idx}")


def _collate(samples):
    ref, vit, video, captions, keys = zip(*[s[:5] for s in samples])
    out = {"ref_frame": np.stack(ref), "vit_frame": np.stack(vit),
           "video_data": np.stack(video), "captions": list(captions),
           "keys": list(keys)}
    # 6th element = subject mask (ImageCustomDataset, for DreamVideo
    # masked diffusion — reference train_dreamvideo_entrance.py:237,284)
    if len(samples[0]) > 5:
        out["mask"] = np.stack([s[5] for s in samples])
    return out


def batch_iterator(dataset, batch_size: int, shuffle: bool = True,
                   seed: int = 0, prefetch: int = 4, num_workers: int = 4,
                   skip_batches: int = 0) -> Iterator[dict]:
    """Parallel prefetching batch loader (replaces torch DataLoader +
    DistributedSampler, reference train_t2v_enterance.py:125-132).

    ``num_workers`` decode threads run ``dataset[i]`` concurrently — cv2
    video decode and PIL image decode release the GIL, so threads give
    real parallel decode without the pickling/IPC cost a process pool
    would add for multi-MB video arrays. Batch ORDER stays deterministic
    (futures are consumed in submission order), so a fixed seed gives a
    reproducible batch stream. ``skip_batches`` fast-forwards the stream
    without decoding — O(1) per skipped batch — so a resumed run at step
    s sees exactly the batch an uninterrupted run would see.
    """
    from concurrent.futures import ThreadPoolExecutor

    rng = random.Random(seed)
    stop = threading.Event()
    ex = ThreadPoolExecutor(max_workers=max(int(num_workers), 1))
    fut_q: queue.Queue = queue.Queue(maxsize=max(int(prefetch), 1))

    def submitter():
        gbi = 0
        while not stop.is_set():
            order = list(range(len(dataset)))
            if shuffle:
                rng.shuffle(order)
            for i in range(0, len(order) - batch_size + 1, batch_size):
                if stop.is_set():
                    return
                if gbi < skip_batches:
                    gbi += 1
                    continue
                futs = [ex.submit(dataset.__getitem__, j)
                        for j in order[i:i + batch_size]]
                # bounded put that re-checks stop: if the consumer
                # abandons the generator while the queue is full, a
                # plain put() would block this thread forever
                while not stop.is_set():
                    try:
                        fut_q.put(futs, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                else:
                    for fu in futs:
                        fu.cancel()
                    return
                gbi += 1

    th = threading.Thread(target=submitter, daemon=True)
    th.start()
    try:
        while True:
            futs = fut_q.get()
            yield _collate([f.result() for f in futs])
    finally:
        stop.set()
        # drain queued batches and cancel their pending decodes so the
        # executor's threads go idle instead of leaking work
        while True:
            try:
                for fu in fut_q.get_nowait():
                    fu.cancel()
            except queue.Empty:
                break
        ex.shutdown(wait=False)
