"""Host decode throughput vs train-step time (VERDICT r1 #8).

Generates N synthetic 448x256 mp4 clips, then measures end-to-end
batch_iterator throughput (decode + transforms + collate) with the
native C++ pipeline on and off, at several thread counts. The margin to
report: videos/sec vs (batch_size / train_step_sec) — decode must
exceed the train step's consumption rate to hide behind device time.

Runs entirely on host (no TPU needed): JAX_PLATFORMS=cpu ok.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_clips(tmp, n=16, f=32, h=256, w=448, fps=16):
    from vgen_tpu.data.video_io import save_video
    rng = np.random.RandomState(0)
    base = rng.rand(1, h, w, 3)
    t = np.linspace(0, 1, f).reshape(f, 1, 1, 1)
    frames = (base * (0.3 + 0.7 * t) * 2.0 - 1.0).astype(np.float32)
    items = []
    for i in range(n):
        p = os.path.join(tmp, f"clip{i}.mp4")
        written = save_video(frames, p, fps=fps)
        if written and written.endswith(".mp4"):
            items.append(written)
    assert items, "no clips written"
    lst = os.path.join(tmp, "list.txt")
    with open(lst, "w") as fh:
        for p in items:
            fh.write(f"{os.path.basename(p)}|||a synthetic clip\n")
    return lst, tmp


def measure(lst, root, num_workers, batches=8, batch_size=4):
    from vgen_tpu.data.datasets import VideoDataset, batch_iterator
    ds = VideoDataset(data_list=[lst], data_dir_list=[root],
                      resolution=(448, 256), sample_fps=8, max_frames=16)
    it = batch_iterator(ds, batch_size=batch_size, shuffle=True, seed=0,
                        prefetch=4, num_workers=num_workers)
    next(it)  # warmup (thread spin-up)
    t0 = time.time()
    for _ in range(batches):
        next(it)
    dt = time.time() - t0
    it.close()
    return batches * batch_size / dt


if __name__ == "__main__":
    with tempfile.TemporaryDirectory() as tmp:
        lst, root = make_clips(tmp, n=int(os.environ.get("N_CLIPS", 16)))
        for native in ("1", "0"):
            os.environ["VGEN_NATIVE_DECODE"] = native
            # reset the module cache so the env takes effect
            import vgen_tpu.data.native_decode as nd
            nd._lib = None
            nd._load_failed = False
            for workers in (1, 4, 8):
                vps = measure(lst, root, workers)
                print(f"native={native} workers={workers}: "
                      f"{vps:6.1f} videos/s", flush=True)
    print("train-step consumption @ batch 4: 4/step_sec videos/s — "
          "compare with BENCH train_step record")
