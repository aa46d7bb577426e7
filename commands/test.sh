#!/usr/bin/env bash
# Render + score the test split (reference command/test.sh:17-32):
# heavy 256+256 sampling at inference, right-half PSNR/SSIM/LPIPS protocol.
set -e
ROOT_DIR=${1:?usage: test.sh <scene_root> <scene_name> [exp_name]}
SCENE=${2:?scene name}
EXP=${3:-exp}

# bfloat16 matmuls match the training recipe (train.sh) and the measured
# eval numbers in BASELINE.md (0.606 s/frame bucketed at 320x240).
# NOTE: reported PSNR/SSIM are therefore bf16-path numbers; for bitwise
# comparison against fp32 reference-parity runs override the dtype:
#   EVAL_DTYPE=float32 ./commands/test.sh ...
EVAL_DTYPE=${EVAL_DTYPE:-bfloat16}
python -m crnerf_tpu eval \
  --root_dir "$ROOT_DIR" \
  --dataset_name phototourism \
  --scene_name "$SCENE" \
  --split test_test \
  --img_downscale 2 \
  --N_samples 256 --N_importance 256 --chunk 16384 \
  --compute_dtype "$EVAL_DTYPE" \
  --ckpt_path ./out/ckpts/"$EXP" \
  --save_dir ./out

python -m crnerf_tpu metrics \
  --root_dir "$ROOT_DIR" \
  --dataset_name phototourism \
  --scene_name "$SCENE" \
  --img_downscale 2 \
  --save_dir ./out
