#!/bin/bash
# Training recipe (counterpart of reference exps/train.sh): flux-dev-fill-lora,
# global bs 16 / micro bs 2, lr 1e-4, lognorm SNR, LoRA rank 256, 384 grid,
# FSDP over all local devices, activation checkpointing.
python -m visualcloze_tpu.training.train \
  --model_name flux-dev-fill-lora \
  --data_path configs/data/visualcloze.yaml \
  --results_dir ./results/visualcloze-384 \
  --global_bsz 16 --micro_bsz 2 \
  --lr 1e-4 --wd 0.0 --grad_clip 2.0 \
  --snr_type lognorm \
  --caption_dropout_prob 0.1 \
  --training_type lora --lora_rank 256 \
  --grid_resolution 384 \
  --max_steps 100000 --ckpt_every 1000 --log_every 10 \
  --checkpointing --use_model_ema --auto_resume "$@"
