#!/usr/bin/env bash
# InstructVideo eval video generation (counterpart of reference
# configs/instructvideo/eval_generate_videos.sh): run every eval recipe.
set -euo pipefail
for cfg in configs/instructvideo/eval/*.yaml; do
    echo "=== $cfg"
    python inference.py --cfg "$cfg"
done
