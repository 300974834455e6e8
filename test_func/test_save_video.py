"""Developer script: video writer check (reference: test_func/test_save_video.py).

  python test_func/test_save_video.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vgen_tpu.data.video_io import save_video, save_video_with_caption


def main():
    frames = (np.random.rand(16, 64, 96, 3) * 255).astype(np.uint8)
    p1 = save_video(frames, "workspace/test_save/plain.mp4", fps=8)
    p2 = save_video_with_caption(frames, "writer check caption",
                                 "workspace/test_save/captioned.mp4", fps=8)
    print("wrote:", p1, p2)
    assert p1 and p2


if __name__ == "__main__":
    main()
