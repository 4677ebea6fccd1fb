#!/bin/bash
# Capacity stream C: DeepONet depth x width grid with fixed p=4
set -u
cd "$(dirname "$0")/../.."
for DEPTH in 2 3 4 5; do
  for WIDTH in 4 8 16 32 64 128 256 512 1024; do
    python main.py --model_type DeepONet --operator Antideriv \
      --net_size ${DEPTH} ${WIDTH} ${DEPTH} ${WIDTH} 4 \
      --num_train 1000 --train_sample_num 10 --num_test 1000 \
      --test_sample_num 100 --batch_size 100 --num_epochs 1000 \
      --learning_rate 0.0001 --multi_seed 0 1 2 3 4 \
      --prefix capacity_reproduction || exit 1
  done
done
echo "STREAM_C_DONE"
