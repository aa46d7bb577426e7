#!/usr/bin/env bash
# Canonical Phototourism training bundle (reference command/train.sh:24).
# N_vocab: 1500 for brandenburg_gate / sacre_coeur, 3200 for trevi_fountain.
# img_downscale 4 trains fast; use 2 for paper-level reproduction.
set -e
ROOT_DIR=${1:?usage: train.sh <scene_root> [exp_name]}
EXP=${2:-exp}

python -m crnerf_tpu train \
  --root_dir "$ROOT_DIR" \
  --dataset_name phototourism \
  --img_downscale 4 \
  --N_vocab 1500 \
  --num_epochs 20 \
  --batch_size 1024 \
  --lr 5e-4 --lr_scheduler cosine --optimizer adam \
  --N_samples 64 --N_importance 64 \
  --compute_dtype bfloat16 --grids_per_step 8 \
  --save_dir ./out --exp_name "$EXP"
