"""Generate the per-example DreamVideo + InstructVideo recipe configs.

The reference ships runnable per-example recipes (22 DreamVideo yamls
under configs/dreamvideo/{subjectLearning,motionLearning,infer[,examples]}
and 7 InstructVideo eval yamls, reference configs/dreamvideo/... and
configs/instructvideo/eval/...). This script emits the same-named
recipes for THIS framework — same parameter values and file layout,
keys matching our engines' config surface — so a user following the
reference README can run the same commands here.

Run from the repo root:  python tools_dev/gen_example_configs.py
Idempotent; outputs are committed.
"""

from __future__ import annotations

import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUBJECTS = {
    "dog2": {"init_word": "dog"},
    "wolf_plushie": {"init_word": "wolf"},
}
MOTIONS = {
    "carTurn": {"data_dir": "data/videos/custom", "batch32": 1,
                "p_image_zero": 0.5, "num_steps": 3000,
                "save_latents": True, "uncond_strength": 1},
    "playingGuitar": {"data_dir": "data/videos/custom/playingGuitar",
                      "batch32": 2, "p_image_zero": 0,
                      "num_steps": 1000, "save_latents": False,
                      "uncond_strength": 0},
}

BASE_MODEL = "models/model_scope_v1-5_0632000.pth"
CLIP_CKPT = "models/open_clip_pytorch_model.bin"

DIFFUSION_BLOCK = """Diffusion: {
    'type': 'DiffusionDDIM',
    'schedule': 'linear_sd',
    'schedule_param': {
        'num_timesteps': 1000,
        'init_beta': 0.00085,
        'last_beta': 0.0120,
        'zero_terminal_snr': False,
    },
    'mean_type': 'eps',
    'loss_type': 'mse',
    'var_type': 'fixed_small',
    'rescale_timesteps': False,
    'noise_strength': 0.1
}"""

UNET_COMMON = """    'in_dim': 4,
    'dim': 320,
    'y_dim': 1024,
    'upper_len': 128,
    'context_dim': 1024,
    'out_dim': 4,
    'dim_mult': [1, 2, 4, 4],
    'num_heads': 8,
    'default_fps': 8,
    'head_dim': 64,
    'num_res_blocks': 2,
    'dropout': 0.1,
    'misc_dropout': 0.4,
    'temporal_attention': True,
    'temporal_attn_times': 1,
    'use_checkpoint': True,
    'use_fps_condition': False,
    'use_sim_mask': False,"""


def write(rel, text):
    path = os.path.join(ROOT, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text.lstrip("\n"))
    print(f"wrote {rel}")


# ----------------------------------------------------------------------- #
# DreamVideo subject learning (step1: textual inversion on UNetSD_T2VBase;
# step2: freeze embedding, train spatial adapters on UNetSD_DreamVideo)
# ----------------------------------------------------------------------- #
def subject_learning(name, step):
    init = SUBJECTS[name]["init_word"]
    if step == 1:
        unet = f"UNet: {{\n    'type': 'UNetSD_T2VBase',\n{UNET_COMMON}\n}}"
        extra = ""
        lr, steps, interval = "0.0001", 3000, 200
        ti, freeze, adapter = True, False, False
        log_dir = "workspace/dreamvideo/subjectLearningStep1"
    else:
        unet = (f"UNet: {{\n    'type': 'UNetSD_DreamVideo',\n{UNET_COMMON}"
                "\n    'spatial_adapter_list': ['cross_attention'],\n}")
        extra = (f"# resume the step-1 learned text embedding (glob ok)\n"
                 f"text_embedding_path: 'workspace/dreamvideo/"
                 f"subjectLearningStep1/{name}_subjectLearning_step1/"
                 f"embeddings/text_embedding_of_*_0003000.pth'\n")
        lr, steps, interval = "0.00001", 1000, 100
        ti, freeze, adapter = True, True, True
        log_dir = "workspace/dreamvideo/subjectLearningStep2"
    return f"""
# DreamVideo subject learning step {step} for '{name}'
# (counterpart of reference configs/dreamvideo/subjectLearning/
# {name}_subjectLearning_step{step}.yaml)
TASK_TYPE: train_dreamvideo_entrance
ENABLE: true
use_ema: false
num_workers: 6
frame_lens: [1]           # images are 1-frame videos
sample_fps: [8]
max_frames: 1
resolution: [256, 256]
vit_resolution: [224, 224]
img_dataset: {{
    'type': 'ImageCustomDataset',
    'data_list': ['data/custom/train/img_{name}.txt'],
    'data_dir_list': ['data/images/custom/{name}'],
    'vit_resolution': [224, 224],
    'resolution': [256, 256],
    'max_words': 6,
    'placeholder_strings': ['*'],
}}
embedder: {{
    'type': 'FrozenOpenCLIPCustomEmbedder',
    'layer': 'penultimate',
    'vit_resolution': [224, 224],
    'pretrained': '{CLIP_CKPT}',
}}
embedmanager: {{
    'type': 'EmbeddingManager',
    'placeholder_strings': ['*'],
    'initializer_words': ['{init}'],
    'per_image_tokens': False,
    'num_vectors_per_token': 1,
    'progressive_words': False,
    'token_dim': 1024,
}}
{unet}
{DIFFUSION_BLOCK}
batch_sizes: {{
    "1": 4
}}
batch_size: 4
visual_train: {{
    'type': 'VisualTrainDreamVideo',
    'partial_keys': [['y']],
    'use_offset_noise': True,
    'guide_scale': 9.0,
    'infer_with_custom_text': True,
    'data_list': ['data/custom/preview/subject_{name}.txt'],
    'data_dir_list': ['data/images/custom/{name}'],
}}
Pretrain: {{
    'type': pretrain_dreamvideo,
    'fix_spatial_weight': True,
    'fix_temporal_weight': True,
    'train_adapter': {adapter},
    'grad_scale': 0.2,
    'resume_checkpoint': '{BASE_MODEL}',
}}
chunk_size: 1
decoder_bs: 8
lr: {lr}
use_textInversion: {ti}
freeze_text_embedding: {freeze}
fix_spatial_weight: True
fix_temporal_weight: True
train_adapter: {adapter}
use_clip_adapter_condition: False
use_mask_diffusion: True
gen_frames: 32
decay_mode: 'none'
negative_prompt: ''
sample_preview: True
{extra}noise_strength: 0.1
p_zero: 0
guide_scale: 9.0
num_steps: {steps}
viz_interval: {interval}
save_ckp_interval: {interval}
log_dir: "{log_dir}"
log_interval: 10
seed: 8888
use_random_seed: False
"""


# ----------------------------------------------------------------------- #
# DreamVideo motion learning (temporal adapters, appearance guidance)
# ----------------------------------------------------------------------- #
def motion_learning(name):
    m = MOTIONS[name]
    return f"""
# DreamVideo motion learning for '{name}'
# (counterpart of reference configs/dreamvideo/motionLearning/
# {name}_motionLearning.yaml)
TASK_TYPE: train_dreamvideo_entrance
ENABLE: true
use_ema: false
num_workers: 6
frame_lens: [32]
sample_fps: [8]
max_frames: 32
resolution: [256, 256]
vit_resolution: [224, 224]
vid_dataset: {{
    'type': 'VideoCustomDataset',
    'data_list': ['data/custom/train/vid_{name}.txt'],
    'data_dir_list': ['{m["data_dir"]}'],
    'vit_resolution': [224, 224],
    'resolution': [256, 256],
    'get_random_frame': True,
    'max_words': 1,
}}
embedder: {{
    'type': 'FrozenOpenCLIPCustomEmbedder',
    'layer': 'penultimate',
    'vit_resolution': [224, 224],
    'pretrained': '{CLIP_CKPT}',
}}
UNet: {{
    'type': 'UNetSD_DreamVideo',
{UNET_COMMON}
    'temporal_adapter_list': ['self_attention', 'cross_attention', 'feedforward'],
    'temporal_adapter_condition_dim': 1024,
}}
{DIFFUSION_BLOCK}
batch_sizes: {{
    "32": {m["batch32"]}
}}
batch_size: {m["batch32"]}
visual_train: {{
    'type': 'VisualTrainDreamVideo',
    'partial_keys': [['y']],
    'use_offset_noise': True,
    'guide_scale': 9.0,
    'infer_with_custom_text': True,
    'data_list': ['data/custom/preview/motion_{name}.txt'],
    'data_dir_list': ['data/images/motionReferenceImgs'],
}}
Pretrain: {{
    'type': pretrain_dreamvideo,
    'fix_spatial_weight': True,
    'fix_temporal_weight': True,
    'train_adapter': True,
    'grad_scale': 0.2,
    'resume_checkpoint': '{BASE_MODEL}',
}}
chunk_size: 1
decoder_bs: 8
lr: 0.00001
use_textInversion: False
freeze_text_embedding: False
fix_spatial_weight: True
fix_temporal_weight: True
train_adapter: True
use_clip_adapter_condition: True
gen_frames: 32
decay_mode: 'none'
negative_prompt: ''
sample_preview: True
save_latents: {m["save_latents"]}
noise_strength: 0.1
p_zero: 0.5
p_image_zero: {m["p_image_zero"]}
guide_scale: 9.0
appearance_guide_strength_cond: 1
appearance_guide_strength_uncond: {m["uncond_strength"]}
num_steps: {m["num_steps"]}
viz_interval: 100
save_ckp_interval: 100
log_dir: "workspace/dreamvideo/motionLearning"
log_interval: 10
seed: 8888
use_random_seed: False
"""


# ----------------------------------------------------------------------- #
# DreamVideo inference recipes (subject / motion / joint x examples/)
# ----------------------------------------------------------------------- #
def dv_infer(kind, subject=None, motion=None, example=False):
    """kind in {subject, motion, joint}. example=True pins the seed and
    names explicit adapter/embedding files (reference infer/examples/);
    otherwise adapter *indices* resolve into the learning log_dir."""
    name = {"subject": f"subject_{subject}",
            "motion": f"motion_{motion}",
            "joint": f"joint_{subject}_{motion}"}[kind]
    lines = [
        f"# DreamVideo {kind} inference recipe '{name}'"
        + (" (examples/ variant)" if example else ""),
        "# (counterpart of reference configs/dreamvideo/infer/"
        + ("examples/" if example else "") + f"{name}.yaml)",
        "TASK_TYPE: inference_dreamvideo_entrance",
        "use_fp16: True",
        "guide_scale: 9.0",
        "chunk_size: 2",
        "decoder_bs: 2",
        "max_frames: 32",
        "scale: 8",
        "batch_size: 1",
        "noise_strength: 0.1",
    ]
    if kind == "motion":
        lines.append("inverse_noise_strength: 0")
    lines += [
        "round: 1",
        "seed: 8888",
        f"use_random_seed: {'False' if example else 'True'}",
        f"log_dir: workspace/dreamvideo/infer/{kind}_custom",
        f"test_list_path: data/custom/infer/{name}.txt",
    ]
    if kind in ("subject", "joint"):
        lines.append(f"test_data_dir: data/images/custom/{subject}")
    else:
        lines.append("test_data_dir: data/images/motionReferenceImgs")
    if subject:
        lines.append("subject_cfg: configs/dreamvideo/subjectLearning/"
                     f"{subject}_subjectLearning_step2.yaml")
    if motion:
        lines.append("motion_cfg: configs/dreamvideo/motionLearning/"
                     f"{motion}_motionLearning.yaml")
    lines.append(f"base_model: {BASE_MODEL}")
    if example:
        if subject:
            lines.append("text_embedding_path: models/DreamVideo/subject/"
                         f"text_embedding/text_embedding_of_{subject}_"
                         "0003000.pth")
            lines.append("identity_adapter_path: models/DreamVideo/"
                         f"subject/{subject}_adapter_00000500.pth")
        if motion:
            lines.append("motion_adapter_path: models/DreamVideo/motion/"
                         f"{motion}_adapter_00001500.pth")
    else:
        if subject:
            lines.append("identity_adapter_index: 500")
        if motion:
            lines.append("motion_adapter_index: 1500")
    if kind in ("motion", "joint"):
        lines.append("appearance_guide_strength_cond: 1")
        lines.append("appearance_guide_strength_uncond: 1")
    return "\n".join(lines) + "\n"


# ----------------------------------------------------------------------- #
# InstructVideo eval recipes
# ----------------------------------------------------------------------- #
IV_EVALS = {
    # name -> (use_lora, ddim, eval_text, caps, ckpt, save_tag)
    "modelscopet2v_infer_UNetSD_t2v_ddim20_in-domain":
        (False, 20, "simple_animals_2_webvid_videos_selected_eval", 263,
         "models/model_scope_v1-4_0600000.pth", "modelscopet2v_ddim20_0600000_"),
    "modelscopet2v_infer_UNetSD_t2v_ddim20_new-animals":
        (False, 20, "eval_simple_animals_2_webvid_videos_selected_eval", 22,
         "models/model_scope_v1-4_0600000.pth", "modelscopet2v_ddim20_0600000_"),
    "modelscopet2v_infer_UNetSD_t2v_ddim20_non-animals":
        (False, 20, "eval_non-animals_hps_v2_all_eval", 46,
         "models/model_scope_v1-4_0600000.pth", "modelscopet2v_ddim20_0600000_"),
    "instructvideo_infer_UNetSD_t2v_webvid_LoRA_webvid_ddim20_in-domain":
        (True, 20, "simple_animals_2_webvid_videos_selected_eval", 263,
         "models/instructvideo-finetuned/ddim20_non_ema_0620000.pth",
         "instructvideo_LoRA_ddim20_0620000_"),
    "instructvideo_infer_UNetSD_t2v_webvid_LoRA_webvid_ddim50_in-domain":
        (True, 50, "simple_animals_2_webvid_videos_selected_eval", 263,
         "models/instructvideo-finetuned/ddim20_non_ema_0620000.pth",
         "instructvideo_LoRA_ddim50_0620000_"),
    "instructvideo_infer_UNetSD_t2v_webvid_LoRA_ddim20_generalization_new-animals":
        (True, 20, "eval_simple_animals_2_webvid_videos_selected_eval", 22,
         "models/instructvideo-finetuned/ddim20_non_ema_0620000.pth",
         "instructvideo_LoRA_ddim20_0620000_gen_"),
    "instructvideo_infer_UNetSD_t2v_webvid_LoRA_ddim20_generalization_non-animals":
        (True, 20, "eval_non-animals_hps_v2_all_eval", 46,
         "models/instructvideo-finetuned/ddim20_non_ema_0620000.pth",
         "instructvideo_LoRA_ddim20_0620000_gen_"),
}


def iv_eval(name):
    use_lora, ddim, eval_text, caps, ckpt, save_tag = IV_EVALS[name]
    # ddim20 -> 951, 901, ..., 1; ddim50 -> 981, 961, ..., 1 (reference
    # eval yamls list these explicitly)
    ddim_steps = ", ".join(str(s) for s in range(951 if ddim == 20 else 981,
                                                 0, -(1000 // ddim)))
    return f"""
# InstructVideo eval recipe (counterpart of reference
# configs/instructvideo/eval/{name}.yaml)
TASK_TYPE: inference_instructvideo_entrance
ENABLE: true
use_fp16: True
frame_lens: [16]
max_frames: 16
resolution: [256, 256]
vit_resolution: [224, 224]
guide_scale: 9.0
scale: 8
round: 1
target_fps: 8
embedder: {{
    'type': 'FrozenOpenCLIPEmbedderZero',
    'layer': 'penultimate',
    'pretrained': '{CLIP_CKPT}'
}}
UNet: {{
    'type': 'UNetSD_LoRA',
    'in_dim': 4,
    'dim': 320,
    'y_dim': 1024,
    'context_dim': 1024,
    'out_dim': 4,
    'dim_mult': [1, 2, 4, 4],
    'num_heads': 8,
    'head_dim': 64,
    'num_res_blocks': 2,
    'attn_scales': [1.0, 0.5, 0.25],
    'dropout': 0.1,
    'temporal_attention': True,
    'temporal_attn_times': 1,
    'use_checkpoint': True,
    'use_fps_condition': False,
    'use_sim_mask': False,
    'use_lora': {use_lora},
    'lora_rank': 4,
}}
chunk_size: 4
decoder_bs: 4
temporal_offset_noise: false
temporal_offset_noise_strength: 0.1
share_noise: False
Diffusion: {{
    'type': 'DiffusionDDIMReward',
    'schedule': 'linear_sd',
    'schedule_param': {{
        'num_timesteps': 1000,
        'init_beta': 0.00085,
        'last_beta': 0.0120,
        'zero_terminal_snr': False,
    }},
    'mean_type': 'eps',
    'loss_type': 'mse',
    'var_type': 'fixed_small',
    'rescale_timesteps': False,
    'noise_strength': 0,
}}
ddim_timesteps: {ddim}
ddim_steps: [{ddim_steps}]
webvid_dir: 'data/instructvideo/'
webvid_cap_file: 'eval/'
webvid_eval_text: '{eval_text}'
webvid_test_caps: {caps}
webvid_dir_save: 'data/instructvideo/generated/{save_tag}'
infer_checkpoint: '{ckpt}'
suffix: ''
seed: 8888
"""


TRAIN_SH = """#!/usr/bin/env bash
# InstructVideo reward fine-tuning launcher (counterpart of reference
# configs/instructvideo/train.sh). Single-host SPMD: jax uses every
# local TPU chip; multi-host runs set WORLD_SIZE/RANK/MASTER_ADDR
# (vgen_tpu/parallel/multihost.py).
set -euo pipefail
cfg=${1:-configs/instructvideo/train/reward_webvid_ani45_20_reg_vidldm_LoRA_TSNExp16Diffreward_Partial06_Trunc1_Check_ddim20.yaml}
python train_net.py --cfg "$cfg"
"""

EVAL_SH = """#!/usr/bin/env bash
# InstructVideo eval video generation (counterpart of reference
# configs/instructvideo/eval_generate_videos.sh): run every eval recipe.
set -euo pipefail
for cfg in configs/instructvideo/eval/*.yaml; do
    echo "=== $cfg"
    python inference.py --cfg "$cfg"
done
"""

IV_TRAIN_NAME = ("reward_webvid_ani45_20_reg_vidldm_LoRA_"
                 "TSNExp16Diffreward_Partial06_Trunc1_Check_ddim20")


def main():
    # --- dreamvideo learning ---
    for s in SUBJECTS:
        for step in (1, 2):
            write(f"configs/dreamvideo/subjectLearning/"
                  f"{s}_subjectLearning_step{step}.yaml",
                  subject_learning(s, step))
    for m in MOTIONS:
        write(f"configs/dreamvideo/motionLearning/{m}_motionLearning.yaml",
              motion_learning(m))
    # --- dreamvideo inference (8 + 8 examples) ---
    for example in (False, True):
        sub = "infer/examples" if example else "infer"
        for s in SUBJECTS:
            write(f"configs/dreamvideo/{sub}/subject_{s}.yaml",
                  dv_infer("subject", subject=s, example=example))
        for m in MOTIONS:
            write(f"configs/dreamvideo/{sub}/motion_{m}.yaml",
                  dv_infer("motion", motion=m, example=example))
        for s in SUBJECTS:
            for m in MOTIONS:
                write(f"configs/dreamvideo/{sub}/joint_{s}_{m}.yaml",
                      dv_infer("joint", subject=s, motion=m,
                               example=example))
    # --- instructvideo eval (7) + train recipe dir + launchers ---
    for name in IV_EVALS:
        write(f"configs/instructvideo/eval/{name}.yaml", iv_eval(name))
    if os.path.exists(os.path.join(ROOT, "configs/instructvideo/train.yaml")):
        with open(os.path.join(ROOT, "configs/instructvideo/train.yaml")) as f:
            body = f.read()
        write(f"configs/instructvideo/train/{IV_TRAIN_NAME}.yaml",
              "# Reference-named training recipe (counterpart of\n"
              f"# configs/instructvideo/train/{IV_TRAIN_NAME}.yaml);\n"
              "# same content as configs/instructvideo/train.yaml.\n"
              + body)
    write("configs/instructvideo/train.sh", TRAIN_SH)
    write("configs/instructvideo/eval_generate_videos.sh", EVAL_SH)
    os.chmod(os.path.join(ROOT, "configs/instructvideo/train.sh"), 0o755)
    os.chmod(os.path.join(ROOT,
                          "configs/instructvideo/eval_generate_videos.sh"),
             0o755)

    # --- prompt/data lists the recipes point at ---
    for s in SUBJECTS:
        write(f"data/custom/train/img_{s}.txt",
              "\n".join(f"{i:02d}.jpg|||a *" for i in range(4)) + "\n")
        write(f"data/custom/preview/subject_{s}.txt",
              "00.jpg|||a * on the beach\n")
        write(f"data/custom/infer/subject_{s}.txt",
              "00.jpg|||a * swimming in the pool\n"
              "00.jpg|||a * on a green meadow\n")
    for m in MOTIONS:
        write(f"data/custom/train/vid_{m}.txt", f"{m}.mp4|||a video\n")
        write(f"data/custom/preview/motion_{m}.txt",
              "ref.jpg|||a car driving down a mountain road\n")
        write(f"data/custom/infer/motion_{m}.txt",
              "ref.jpg|||a jeep driving through shallow water\n")
    for s in SUBJECTS:
        for m in MOTIONS:
            write(f"data/custom/infer/joint_{s}_{m}.txt",
                  "00.jpg|||a * running on the road\n"
                  "00.jpg|||a * running on the beach\n")


if __name__ == "__main__":
    main()
