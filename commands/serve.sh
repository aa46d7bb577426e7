#!/usr/bin/env bash
# Resident render server (no reference equivalent): keeps the model and
# the bucketed XLA executables live, serves renders over line-JSON TCP.
set -e
CKPT=${1:?usage: serve.sh <ckpt_dir_or_npz> [port]}
PORT=${2:-7060}

python -m crnerf_tpu serve \
  --ckpt_path "$CKPT" \
  --port "$PORT" \
  --N_samples 256 --N_importance 256 --chunk 16384 \
  --warmup 320x240

# then e.g.:
#   python scripts/serve_client.py --port $PORT '{"op": "ping"}'
#   python scripts/serve_client.py --port $PORT --render --wh 320 240 \
#       --style_image images/artworks/starry.jpg --out frame.png
