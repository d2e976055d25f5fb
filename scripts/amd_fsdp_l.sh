#!/usr/bin/env bash
# AMD_L (~700M) with fsdp+tensor sharding on 8 chips — a capability the
# DDP-only reference lacks (SURVEY.md §2.5).
set -e
python train_amd.py \
  --exp_name amd_l_fsdp \
  --model_type AMD_L \
  --mesh 2,2,2 \
  --video_frames 16 \
  --train_batch_size 16 \
  --learning_rate 1e-4 \
  --mp bf16 \
  --video_dir "$1" \
  "${@:2}"
