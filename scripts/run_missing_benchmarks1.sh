#!/bin/bash
# Targeted completion of the reproduce_benchmarks1 sweep: the 19 configs
# absent from docs/benchmarks1_results.csv (all 14 Darcy + 5 Advection
# classical/fixed-frequency).  Same hyperparameter tables as
# scripts/reproduce_benchmarks1.sh (reference scripts/reproduce_benchmarks1.sh:44-69).
set -u
cd "$(dirname "$0")/.."

COMMON="--num_train 1000 --num_test 1000 --batch_size 100 --learning_rate 0.0001 \
 --num_epochs 100 --num_points_0 100 --multi_seed 0 1 2 3 4 --prefix benchmarks1_reproduction"
ADV="--operator Advection --train_sample_num 100 --test_sample_num 1000 --num_points 100"
DAR="--operator Darcy --train_sample_num 100 --test_sample_num 500 --num_points 25"

run() { echo "▶ $*"; python main.py "$@" || exit 1; }

# Advection: QuanONet fixed-frequency (3 scales) + classical baselines
for S in 0.1 0.01 0.001; do
  run $COMMON $ADV --model_type QuanONet --net_size 40 2 40 2 --if_trainable_freq false --scale_coeff $S
done
run $COMMON $ADV --model_type DeepONet --net_size 3 15 3 15
run $COMMON $ADV --model_type FNN --net_size 3 16

# Darcy: full 14-config table
for S in 0.1 0.01 0.001; do
  run $COMMON $DAR --model_type QuanONet --net_size 40 2 20 2 --if_trainable_freq true --scale_coeff $S
done
for S in 0.1 0.01 0.001; do
  run $COMMON $DAR --model_type QuanONet --net_size 40 2 40 2 --if_trainable_freq false --scale_coeff $S
done
for S in 0.1 0.01 0.001; do
  run $COMMON $DAR --model_type HEAQNN --net_size 64 2 --if_trainable_freq true --scale_coeff $S
done
for S in 0.1 0.01 0.001; do
  run $COMMON $DAR --model_type HEAQNN --net_size 80 2 --if_trainable_freq false --scale_coeff $S
done
run $COMMON $DAR --model_type DeepONet --net_size 3 15 3 15
run $COMMON $DAR --model_type FNN --net_size 3 16

echo "✅ missing benchmarks1 configs complete"
