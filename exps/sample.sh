#!/bin/bash
# Evaluation recipe (counterpart of reference exps/sample.sh):
# guidance 30, 30 steps, euler, rank 256, resolution 384.
python sample.py \
  --model_path "$1" \
  --test_json ./graph200k/test_data.json \
  --output_dir ./samples \
  --resolution 384 --lora_rank 256 \
  --guidance 30.0 --steps 30 --solver euler --seed 0
