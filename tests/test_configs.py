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


REF_RECIPES = [
    # reference per-example recipe names (configs/dreamvideo/... and
    # configs/instructvideo/...) that must exist HERE with the same
    # relative path, so reference README commands run unchanged
    f"configs/dreamvideo/{sub}/{stem}.yaml"
    for sub in ("infer", "infer/examples")
    for stem in ("subject_dog2", "subject_wolf_plushie", "motion_carTurn",
                 "motion_playingGuitar", "joint_dog2_carTurn",
                 "joint_dog2_playingGuitar", "joint_wolf_plushie_carTurn",
                 "joint_wolf_plushie_playingGuitar")
] + [
    f"configs/dreamvideo/subjectLearning/{s}_subjectLearning_step{i}.yaml"
    for s in ("dog2", "wolf_plushie") for i in (1, 2)
] + [
    f"configs/dreamvideo/motionLearning/{m}_motionLearning.yaml"
    for m in ("carTurn", "playingGuitar")
] + [
    f"configs/instructvideo/eval/{n}.yaml" for n in (
        "modelscopet2v_infer_UNetSD_t2v_ddim20_in-domain",
        "modelscopet2v_infer_UNetSD_t2v_ddim20_new-animals",
        "modelscopet2v_infer_UNetSD_t2v_ddim20_non-animals",
        "instructvideo_infer_UNetSD_t2v_webvid_LoRA_webvid_ddim20_in-domain",
        "instructvideo_infer_UNetSD_t2v_webvid_LoRA_webvid_ddim50_in-domain",
        "instructvideo_infer_UNetSD_t2v_webvid_LoRA_ddim20_generalization_new-animals",
        "instructvideo_infer_UNetSD_t2v_webvid_LoRA_ddim20_generalization_non-animals",
    )
] + [
    "configs/instructvideo/train/reward_webvid_ani45_20_reg_vidldm_LoRA_"
    "TSNExp16Diffreward_Partial06_Trunc1_Check_ddim20.yaml",
    "configs/instructvideo/train.sh",
    "configs/instructvideo/eval_generate_videos.sh",
]


@pytest.mark.parametrize("path", REF_RECIPES)
def test_reference_named_recipe_exists(path):
    import os
    assert os.path.exists(path), f"missing reference-named recipe {path}"
    if path.endswith(".yaml"):
        with open(path) as fh:
            cfg = yaml.safe_load(fh)
        assert isinstance(cfg, dict), path


def test_dreamvideo_recipe_merge_chain():
    """The joint recipe must merge subject + motion learning configs
    into a UNet carrying BOTH adapter lists (reference
    inference_dreamvideo_entrance.py:68-77 merge order)."""
    from vgen_tpu.core.config import AttrDict, assign_signle_cfg

    with open("configs/dreamvideo/infer/joint_dog2_carTurn.yaml") as fh:
        cfg = AttrDict(yaml.safe_load(fh))
    up = dict(cfg)
    cfg = assign_signle_cfg(cfg, up, "subject_cfg")
    cfg = assign_signle_cfg(cfg, up, "motion_cfg")
    unet = dict(cfg.UNet)
    assert unet["type"] == "UNetSD_DreamVideo"
    assert unet["spatial_adapter_list"] == ["cross_attention"]
    assert unet["temporal_adapter_list"] == [
        "self_attention", "cross_attention", "feedforward"]
    assert unet["temporal_adapter_condition_dim"] == 1024
