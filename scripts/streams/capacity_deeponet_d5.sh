#!/bin/bash
# Capacity stream D: DeepONet depth-5 grid, big widths DESCENDING so it
# meets the ascending stream C in the middle (resume-skippable; the
# tunnel overlaps concurrent sessions' compiles with chip execution).
set -u
cd "$(dirname "$0")/../.."
for WIDTH in 1024 512 256 128; do
  python main.py --model_type DeepONet --operator Antideriv \
    --net_size 5 ${WIDTH} 5 ${WIDTH} 4 \
    --num_train 1000 --train_sample_num 10 --num_test 1000 \
    --test_sample_num 100 --batch_size 100 --num_epochs 1000 \
    --learning_rate 0.0001 --multi_seed 0 1 2 3 4 \
    --prefix capacity_reproduction || exit 1
done
echo "STREAM_D5_DONE"
