#!/usr/bin/env bash
# Label->motion head on class-labeled clips (reference train_t2m.py on
# UCF-101). usage: t2m_ucf.sh <t2m_config.json> <labeled_video_dir> \
#        --amd_config <cfg.json> --amd_ckpt <ckpt> [flags]
set -e
python train_t2m.py \
  --t2m_config "$1" \
  --video_dir "$2" \
  --exp_name t2m_ucf \
  --train_batch_size 32 \
  --mp bf16 \
  "${@:3}"
