#!/usr/bin/env bash
# Camera-path renders with a fixed appearance (reference
# command/get_rendered_images.sh): the '--split test' parametric path.
set -e
ROOT_DIR=${1:?usage: get_rendered_images.sh <scene_root> <scene_name> [exp]}
SCENE=${2:?scene name}
EXP=${3:-exp}

python -m crnerf_tpu eval \
  --root_dir "$ROOT_DIR" \
  --dataset_name phototourism \
  --scene_name "$SCENE" \
  --split test \
  --img_wh 320 240 \
  --N_samples 256 --N_importance 256 --chunk 16384 \
  --ckpt_path ./out/ckpts/"$EXP" \
  --save_dir ./out
