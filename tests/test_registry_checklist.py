"""The judge checklist (SURVEY §2.8): every registered name the reference
exposes must exist in our registries."""

import vgen_tpu  # noqa: F401
import vgen_tpu.engines  # noqa: F401
from vgen_tpu.core import (AUTO_ENCODER, DATASETS, DIFFUSION, DISTRIBUTION,
                           EMBEDDER, EMBEDMANAGER, ENGINE, INFER_ENGINE,
                           MODEL, PRETRAIN, VISUAL)

CHECKLIST = {
    ENGINE: ["train_t2v_entrance", "train_dreamvideo_entrance",
             "t2v_instructvideo_entrance", "train_videolcm_t2v_entrance"],
    INFER_ENGINE: ["inference_text2video_entrance",
                   "inference_i2vgen_entrance", "inference_sr600_entrance",
                   "inference_higen_entrance", "inference_tft2v_entrance",
                   "inference_tft2v_sr600_entrance",
                   "inference_tft2v_vcomposer_entrance",
                   "inference_videolcm_entrance",
                   "inference_videolcm_vcomposer_entrance",
                   "inference_dreamvideo_entrance",
                   "inference_instructvideo_entrance"],
    MODEL: ["UNetSD_T2VBase", "UNetSD_I2VGen", "UNetSD_TFT2V",
            "UNetSD_VideoLCM", "UNetSD_HiGen", "UNetSD_SR600",
            "UNetSD_DreamVideo", "UNetSD_LoRA"],
    DIFFUSION: ["DiffusionDDIM", "DiffusionDDIMReward", "DiffusionDDIMSR"],
    AUTO_ENCODER: ["AutoencoderKL", "AutoencoderVideo"],
    DISTRIBUTION: ["DiagonalGaussianDistribution"],
    EMBEDDER: ["FrozenOpenCLIPEmbedder", "FrozenOpenCLIPVisualEmbedder",
               "FrozenOpenCLIPTextVisualEmbedder", "FrozenOpenCLIPEmbedderZero",
               "FrozenOpenCLIPCustomEmbedder"],
    EMBEDMANAGER: ["EmbeddingManager"],
    DATASETS: ["VideoDataset", "VideoCustomDataset", "ImageDataset",
               "ImageCustomDataset"],
    PRETRAIN: ["pretrain_specific_strategies", "pretrain_dreamvideo",
               "pretrain_instructvideo", "pretrain_from_sd",
               "pretrain_ema_model"],
    VISUAL: ["VisualTrainTextToVideo", "VisualTrainTextImageToVideo",
             "VisualTrainDreamVideo", "VisualVideoTextDuringTrainUnClip"],
}


def test_registry_checklist_complete():
    missing = {}
    for registry, names in CHECKLIST.items():
        miss = [n for n in names if n not in registry]
        if miss:
            missing[registry.name] = miss
    assert not missing, f"registry checklist gaps: {missing}"
