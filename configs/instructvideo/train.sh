#!/usr/bin/env bash
# InstructVideo reward fine-tuning launcher (counterpart of reference
# configs/instructvideo/train.sh). Single-host SPMD: jax uses every
# local TPU chip; multi-host runs set WORLD_SIZE/RANK/MASTER_ADDR
# (vgen_tpu/parallel/multihost.py).
set -euo pipefail
cfg=${1:-configs/instructvideo/train/reward_webvid_ani45_20_reg_vidldm_LoRA_TSNExp16Diffreward_Partial06_Trunc1_Check_ddim20.yaml}
python train_net.py --cfg "$cfg"
