#!/usr/bin/env bash
# MAE latent pretrain (reference train_mae.py stage).
# usage: mae_pretrain.sh <video_dir> [extra flags]
set -e
python train_mae.py \
  --exp_name mae_s \
  --model_type MAE_S \
  --train_batch_size 64 \
  --learning_rate 1e-4 \
  --mp bf16 \
  --video_dir "$1" \
  "${@:2}"
