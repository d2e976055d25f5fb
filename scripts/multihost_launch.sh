#!/usr/bin/env bash
# Multihost launcher (docs/MULTIHOST.md). Run the SAME command on every host
# of the slice; on Cloud TPU the coordinator/process topology autodetects
# from TPU metadata, elsewhere set the HIVAE_* vars explicitly.
#
#   ./scripts/multihost_launch.sh <video_dir> [extra train_amd.py flags...]
#
# Explicit topology example (GPU/CPU clusters):
#   HIVAE_COORDINATOR=10.0.0.1:8476 HIVAE_NUM_PROCESSES=4 \
#   HIVAE_PROCESS_ID=$RANK ./scripts/multihost_launch.sh /data/videos
set -e
VIDEO_DIR="$1"; shift || true
exec env HIVAE_MULTIHOST=1 python train_amd.py \
  --exp_name amd_multihost \
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
  --remat true --mu_dtype bf16 \
  --video_dir "$VIDEO_DIR" \
  "$@"
