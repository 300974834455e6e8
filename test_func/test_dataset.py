"""Developer script: materialize dataset samples as labeled videos for
eyeballing (reference: test_func/test_dataset.py:17-151).

  python test_func/test_dataset.py --cfg configs/t2v_train.yaml
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import vgen_tpu  # noqa: F401
from vgen_tpu.core import DATASETS, Config
from vgen_tpu.data.video_io import save_video_with_caption


def main():
    cfg = Config(load=True).cfg_dict
    out_dir = os.path.join(cfg.get("log_dir", "workspace"), "test_data")
    os.makedirs(out_dir, exist_ok=True)

    if "vid_dataset" not in cfg:
        from vgen_tpu.core import default_cfg
        cfg = dict(default_cfg(), **cfg)
    ds_cfg = dict(cfg["vid_dataset"])
    ds_cfg.setdefault("max_frames", 16)
    ds_cfg.setdefault("sample_fps", 8)
    dataset = DATASETS.build(ds_cfg)
    if len(dataset) == 0:
        from vgen_tpu.data.datasets import SyntheticVideoDataset
        print("dataset empty — using SyntheticVideoDataset")
        dataset = SyntheticVideoDataset(resolution=ds_cfg.get("resolution",
                                                              (448, 256)))
    for i in range(min(4, len(dataset))):
        ref, vit, video, caption, key = dataset[i][:5]
        path = os.path.join(out_dir, f"sample_{i:02d}_{key}.mp4")
        written = save_video_with_caption(video, caption or "(no caption)",
                                          path)
        print(f"[{i}] {caption!r} -> {written}")


if __name__ == "__main__":
    main()
