"""Every shipped yaml config must parse through the Config loader and
name only registered components (catches typo'd TASK_TYPE/type keys)."""

import glob

import pytest
import yaml

import vgen_tpu  # noqa: F401  (registration side effects)
import vgen_tpu.engines  # noqa: F401  (engine registration)
from vgen_tpu.core import (AUTO_ENCODER, DIFFUSION, EMBEDDER, ENGINE,
                           INFER_ENGINE, MODEL)

CONFIGS = sorted(glob.glob("configs/**/*.yaml", recursive=True))


@pytest.mark.parametrize("path", CONFIGS)
def test_config_parses_and_types_registered(path):
    with open(path) as fh:
        cfg = yaml.safe_load(fh)
    assert isinstance(cfg, dict), path
    task = cfg.get("TASK_TYPE")
    if task and path != "configs/base.yaml":
        assert task in ENGINE or task in INFER_ENGINE, \
            f"{path}: unknown TASK_TYPE {task!r}"
    for key, reg in (("UNet", MODEL), ("Diffusion", DIFFUSION),
                     ("auto_encoder", AUTO_ENCODER), ("embedder", EMBEDDER)):
        sub = cfg.get(key)
        if isinstance(sub, dict) and "type" in sub:
            assert sub["type"] in reg, \
                f"{path}: unknown {key} type {sub['type']!r}"


def test_config_count_covers_reference_families():
    """The reference ships config families {t2v, i2vgen, sr600, higen,
    tft2v(+sr/vcomposer), videolcm(+sr/vcomposer), dreamvideo,
    instructvideo}; one of each must exist here."""
    names = " ".join(CONFIGS)
    for fam in ("t2v_infer", "t2v_train", "i2vgen_xl_infer",
                "i2vgen_xl_train", "sr600_infer", "higen_infer",
                "higen_train", "tft2v_t2v_infer", "tft2v_vcomposer_infer",
                "tft2v_16frames_sr600", "videolcm_t2v_infer",
                "videolcm_t2v_train", "videolcm_vcomposer",
                "dreamvideo", "instructvideo"):
        assert fam in names, f"missing config family: {fam}"
