"""Native C++ decode pipeline (native/video_decode.cc) vs the Python
cv2 oracle: identical frames, identical fps-stride sampling; pool API
returns the same data as the blocking API. Skips when the library can't
be built (no toolchain / OpenCV dev headers)."""

import os

import numpy as np
import pytest

from vgen_tpu.data import native_decode
from vgen_tpu.data.video_io import save_video


def _make_video(tmp_path, f=12, h=64, w=96, fps=12):
    rng = np.random.RandomState(0)
    # smooth low-frequency content (codec-friendly; avoids high-freq
    # quantization differences between decoder builds)
    base = rng.rand(1, h, w, 3)
    t = np.linspace(0, 1, f).reshape(f, 1, 1, 1)
    frames = (base * (0.3 + 0.7 * t) * 2.0 - 1.0).astype(np.float32)
    path = str(tmp_path / "clip.mp4")
    written = save_video(frames, path, fps=fps)
    return written


def _cv2_decode(path, max_frames=-1, sample_fps=None):
    import cv2
    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
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
    return np.stack(frames)


@pytest.fixture(scope="module")
def lib_ok():
    if not native_decode.available():
        pytest.skip("native decode library unavailable")
    return True


def test_native_matches_cv2(tmp_path, lib_ok):
    path = _make_video(tmp_path)
    if not path or not path.endswith(".mp4"):
        pytest.skip("no mp4 writer available")
    for kwargs in ({}, {"sample_fps": 6}, {"max_frames": 4},
                   {"sample_fps": 6, "max_frames": 3}):
        ref = _cv2_decode(path, **{k: v for k, v in kwargs.items()})
        out = native_decode.read_video_frames_native(path, **kwargs)
        assert out.shape == ref.shape, kwargs
        assert out.dtype == np.uint8
        # same libavcodec-family H.264 decode should be bit-identical;
        # allow +-1 LSB for decoder build differences
        diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
        assert diff.max() <= 1, (kwargs, diff.max())


def test_native_pool_matches_blocking(tmp_path, lib_ok):
    path = _make_video(tmp_path)
    if not path or not path.endswith(".mp4"):
        pytest.skip("no mp4 writer available")
    blocking = native_decode.read_video_frames_native(path)
    pool = native_decode.DecodePool(num_threads=3)
    try:
        tickets = [pool.submit(path) for _ in range(6)]
        for t in tickets:
            out = pool.fetch(t)
            np.testing.assert_array_equal(out, blocking)
    finally:
        pool.close()


def test_native_failure_raises(tmp_path, lib_ok):
    with pytest.raises(IOError):
        native_decode.read_video_frames_native(str(tmp_path / "nope.mp4"))


def test_read_video_frames_uses_native(tmp_path, lib_ok):
    """The public read_video_frames must return the same frames whether
    the native path is on or off."""
    from vgen_tpu.data.video_io import read_video_frames
    path = _make_video(tmp_path)
    if not path or not path.endswith(".mp4"):
        pytest.skip("no mp4 writer available")
    a = read_video_frames(path, sample_fps=6)
    b = _cv2_decode(path, sample_fps=6)
    assert a.shape == b.shape
    assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1
