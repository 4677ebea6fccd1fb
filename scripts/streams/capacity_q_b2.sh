#!/bin/bash
# Capacity stream B: Q2 QuanONet grid, HB in {150,200} (resume-skippable)
set -u
cd "$(dirname "$0")/../.."
for HB in 200; do
  for HT in 10 20 30 40 50 60 100 150 200 300; do
    python main.py --model_type QuanONet --operator Antideriv \
      --num_qubits 2 --net_size ${HB} 2 ${HT} 2 --if_trainable_freq true \
      --num_train 1000 --train_sample_num 10 --num_test 1000 \
      --test_sample_num 100 --batch_size 100 --num_epochs 1000 \
      --learning_rate 0.0001 --multi_seed 0 1 2 3 4 \
      --prefix capacity_reproduction || exit 1
  done
done
echo "STREAM_B2_DONE"
