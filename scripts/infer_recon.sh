#!/usr/bin/env bash
# Batch reconstruction inference (reference scripts' amd_inference launch).
# usage: infer_recon.sh <exp_dir> <video_dir> [extra flags]
set -e
python amd_inference.py \
  --amd_config "$1/config.json" \
  --amd_ckpt "$1/checkpoints" \
  --video_dir "$2" \
  --output_dir output/recon \
  "${@:3}"
