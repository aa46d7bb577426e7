#!/usr/bin/env bash
# Appearance-hallucination video (reference command/get_video_demo.sh):
# render a 240-frame camera path styled by each image in a folder.
set -e
CKPT=${1:?usage: get_video_demo.sh <ckpt_dir_or_npz> <scene_name> <style_dir>}
SCENE=${2:?scene name (brandenburg_gate | trevi_fountain)}
STYLES=${3:?folder of style images}

python -m crnerf_tpu video \
  --ckpt_path "$CKPT" \
  --scene_name "$SCENE" \
  --style_dir "$STYLES" \
  --img_wh 320 240 \
  --N_samples 256 --N_importance 256 --chunk 16384 \
  --save_dir ./out
