#!/usr/bin/env bash
# A2M audio->motion head training — parity with the reference launcher set
# (scripts_zqy/a2m/*): frozen AMD + VAE, cross-attn audio decoder from a
# json spec (config/a2m/cross_audio_t1d512_l16_dim1024 equivalent).
# usage: a2m_cross_audio.sh <a2m_config.json> <video_index_or_dir> \
#        --amd_config <cfg.json> --amd_ckpt <ckpt> [extra flags]
set -e
python train_a2m.py \
  --exp_name a2m_cross_audio \
  --a2m_config "$1" \
  --video_dir "$2" \
  --train_batch_size 32 \
  --learning_rate 1e-4 \
  --mp bf16 \
  --max_train_steps 100000 \
  "${@:3}"
