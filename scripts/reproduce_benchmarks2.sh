#!/bin/bash
# ==============================================================================
# Aligned-parameter comparison (reference scripts/reproduce_benchmarks2.sh):
# TF-QuanONet 160-2-90-2 (S0.001) vs DeepONet 4-32-4-32 vs FNO 19-9-3-43
# (bs=1) on the three ODE operators, 100 training functions.
# Seeds run as one vmapped program instead of parallel processes.
# ==============================================================================
set -u
cd "$(dirname "$0")/.."

NUM_TRAIN=100
NUM_TEST=1000
TRAIN_SAMPLE=10
TEST_SAMPLE=100
BATCH_SIZE=100
LR=0.0001
EPOCHS=1000
PTS=100
PTS_0=100
PREFIX="benchmarks2_reproduction"
SEEDS="0 1 2 3 4"

OPERATORS=("Antideriv" "Homogeneous" "Nonlinear")
MODELS=("QuanONet" "DeepONet" "FNO")

for OP in "${OPERATORS[@]}"; do
    echo "▶ Operator: ${OP} | Epochs: ${EPOCHS} | Train: ${NUM_TRAIN}x${TRAIN_SAMPLE}"
    for MODEL in "${MODELS[@]}"; do
        EXTRA_ARGS=""
        CURRENT_BATCH_SIZE=${BATCH_SIZE}
        if [[ "$MODEL" == "QuanONet" ]]; then
            NET_SIZE="160 2 90 2"
            EXTRA_ARGS="--scale_coeff 0.001 --if_trainable_freq true"
        elif [[ "$MODEL" == "DeepONet" ]]; then
            NET_SIZE="4 32 4 32"
        else
            NET_SIZE="19 9 3 43"   # (modes, width, depth, fc_hidden)
            CURRENT_BATCH_SIZE=1
        fi
        echo "  ${MODEL} | Size=[${NET_SIZE}] | seeds {${SEEDS}}"
        python main.py \
            --model_type "${MODEL}" --operator "${OP}" \
            --net_size ${NET_SIZE} \
            --num_train ${NUM_TRAIN} --train_sample_num ${TRAIN_SAMPLE} \
            --num_test ${NUM_TEST} --test_sample_num ${TEST_SAMPLE} \
            --batch_size ${CURRENT_BATCH_SIZE} --num_epochs ${EPOCHS} \
            --learning_rate ${LR} \
            --num_points ${PTS} --num_points_0 ${PTS_0} \
            --multi_seed ${SEEDS} \
            --prefix "${PREFIX}" ${EXTRA_ARGS} || exit 1
    done
done
echo "✅ Aligned-parameter comparison experiments completed."
