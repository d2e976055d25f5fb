#!/usr/bin/env bash
# Main AMD training config — parity with the reference launcher
# scripts/amd_t1d512_nonorm_spatial.sh: 16 frames @ 256^2, batch 4/chip,
# lr 1e-4, motion 4 tokens x 512 ch, spatial DiT. On a v5e-8 the default
# mesh is 8-way data parallel; pass --mesh for fsdp/tensor sharding.
# Throughput-optimal per-chip alternative (benchmarks/RESULTS.md): batch
# 1/chip with --remat_policy dots is ~6% faster than batch 4/chip full-remat
# at this 696M size; add --ema_decay 0.999 for EMA eval weights.
set -e
python train_amd.py \
  --exp_name amd_t1d512_spatial \
  --model_type AMD_N \
  --diffusion_model_type spatial \
  --video_frames 16 \
  --use_filter true --use_grey true \
  --object_motion_token_num 4 --object_motion_token_channel 512 \
  --camera_motion_token_num 16 --camera_motion_token_channel 16 \
  --motion_token_num 4 --motion_token_channel 512 \
  --train_batch_size 32 \
  --learning_rate 1e-4 \
  --mp bf16 \
  --remat true --mu_dtype bf16 --scan_layers true \
  --max_train_steps 100000 \
  --save_checkpoint_interval_step 2000 \
  --video_dir "$1" \
  "${@:2}"
