"""Execute every INFER_ENGINE entrance end-to-end on its tiny config.

VERDICT r3 weak #3: 6 of 11 entrances were never executed by tests —
the engine glue (cfg plumbing, condition assembly, shape bookkeeping) is
the classic place for rot. This parametrized suite drives ALL 11 names
from the SURVEY §2.8 checklist through ``INFER_ENGINE.build`` on CPU
(random weights, 64x64, 4 frames, few DDIM steps) and asserts each
writes at least one video file (reference worker skeleton:
inference_i2vgen_entrance.py:80-250).
"""

import os
import os.path as osp
import shutil

import pytest
import yaml

import vgen_tpu  # noqa: F401
import vgen_tpu.engines  # noqa: F401
from vgen_tpu.core import INFER_ENGINE

# (registered name, tiny config, 1-line test list to write: (fmt, None))
CASES = [
    ("inference_text2video_entrance", "configs/t2v_infer_tiny.yaml",
     "caption"),
    ("inference_i2vgen_entrance", "configs/i2vgen_infer_tiny.yaml",
     "img|||caption"),
    ("inference_sr600_entrance", "configs/sr600_infer_tiny.yaml",
     "caption|||vid"),
    ("inference_higen_entrance", "configs/tiny/higen.yaml", "caption"),
    ("inference_tft2v_entrance", "configs/tiny/tft2v_t2v.yaml", "caption"),
    ("inference_tft2v_sr600_entrance", "configs/tiny/tft2v_sr600_chain.yaml",
     "caption"),
    ("inference_tft2v_vcomposer_entrance", "configs/tiny/tft2v_vcomposer.yaml",
     "vid|||caption"),
    ("inference_videolcm_entrance", "configs/tiny/videolcm.yaml", "caption"),
    ("inference_videolcm_vcomposer_entrance",
     "configs/tiny/videolcm_vcomposer.yaml", "vid|||caption"),
    ("inference_dreamvideo_entrance", "configs/tiny/dreamvideo_infer.yaml",
     "caption*"),
    ("inference_instructvideo_entrance",
     "configs/tiny/instructvideo_infer.yaml", "caption"),
]

DEMO_VIDEO = "data/videos/sample_00_syn_0.mp4"
DEMO_IMAGE = "data/test_img.png"


def test_cases_cover_the_full_checklist():
    """The parametrization below must cover every registered INFER_ENGINE
    name (SURVEY §2.8) — adding an engine without wiring it here fails."""
    registered = set(INFER_ENGINE.keys()) if hasattr(INFER_ENGINE, "keys") \
        else set(INFER_ENGINE._obj_map)  # registry internal map
    assert {n for n, _, _ in CASES} == registered


def _one_line_list(fmt: str, tmp_path) -> str:
    line = {
        "caption": "a panda eating bamboo on a rock",
        "caption*": "a * swimming in the pool",
        "img|||caption": f"{DEMO_IMAGE}|||a tiny test image come to life",
        "vid|||caption": f"{DEMO_VIDEO}|||a tiny test video of moving colors",
        "caption|||vid": f"a tiny test video of moving colors|||{DEMO_VIDEO}",
    }[fmt]
    path = osp.join(str(tmp_path), "test_list.txt")
    with open(path, "w") as fh:
        fh.write(line + "\n")
    return path


@pytest.mark.slow
@pytest.mark.parametrize("name,config,fmt", CASES,
                         ids=[c[0].replace("inference_", "").replace(
                             "_entrance", "") for c in CASES])
def test_entrance_runs_and_writes_video(name, config, fmt, tmp_path):
    with open(config) as fh:
        cfg = yaml.safe_load(fh)
    assert cfg["TASK_TYPE"] == name
    cfg["test_list_path"] = _one_line_list(fmt, tmp_path)
    cfg["log_dir"] = str(tmp_path / "out")
    cfg["round"] = 1

    outputs = INFER_ENGINE.build(dict(type=name), cfg_update=cfg)

    assert outputs, f"{name} returned no outputs"
    written = [p for p in outputs if p and osp.exists(p)]
    assert written, f"{name} wrote no files (returned {outputs})"
    assert all(os.path.getsize(p) > 0 for p in written)
