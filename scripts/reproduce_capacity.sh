#!/bin/bash
# ==============================================================================
# Capacity grid (reference scripts/reproduce_capacity.sh): Q2 TF-QuanONet
# hidden-block grid HBx HT, and DeepONet depth/width grid with fixed p=4.
# ==============================================================================
set -u
cd "$(dirname "$0")/.."

NUM_TRAIN=1000
NUM_TEST=1000
TRAIN_SAMPLE=10
TEST_SAMPLE=100
BATCH_SIZE=100
LR=0.0001
EPOCHS=1000
PREFIX="capacity_reproduction"
SEEDS="0 1 2 3 4"
OPERATOR="${1:-Antideriv}"

# Branch 1: TF-QuanONet Q2 grid
NUM_QUBITS=2
HB_LIST=(50 100 150 200)
HT_LIST=(10 20 30 40 50 60 100 150 200 300)
echo "▶ Branch 1: QuanONet (TF, Qubits=${NUM_QUBITS})"
for HB in "${HB_LIST[@]}"; do
    for HT in "${HT_LIST[@]}"; do
        NET_SIZE="${HB} 2 ${HT} 2"
        echo "  QuanONet | Size=[${NET_SIZE}] | seeds {${SEEDS}}"
        python main.py \
            --model_type QuanONet --operator "${OPERATOR}" \
            --num_qubits ${NUM_QUBITS} --net_size ${NET_SIZE} \
            --if_trainable_freq true \
            --num_train ${NUM_TRAIN} --train_sample_num ${TRAIN_SAMPLE} \
            --num_test ${NUM_TEST} --test_sample_num ${TEST_SAMPLE} \
            --batch_size ${BATCH_SIZE} --num_epochs ${EPOCHS} \
            --learning_rate ${LR} \
            --multi_seed ${SEEDS} --prefix "${PREFIX}" || exit 1
    done
done

# Branch 2: DeepONet grid with explicit output dim p=4
OUTPUT_DIM=4
DEPTH_LIST=(2 3 4 5)
WIDTH_LIST=(4 8 16 32 64 128 256 512 1024)
echo "▶ Branch 2: DeepONet (p=${OUTPUT_DIM})"
for DEPTH in "${DEPTH_LIST[@]}"; do
    for WIDTH in "${WIDTH_LIST[@]}"; do
        NET_SIZE="${DEPTH} ${WIDTH} ${DEPTH} ${WIDTH} ${OUTPUT_DIM}"
        echo "  DeepONet | Size=[${NET_SIZE}] | seeds {${SEEDS}}"
        python main.py \
            --model_type DeepONet --operator "${OPERATOR}" \
            --net_size ${NET_SIZE} \
            --num_train ${NUM_TRAIN} --train_sample_num ${TRAIN_SAMPLE} \
            --num_test ${NUM_TEST} --test_sample_num ${TEST_SAMPLE} \
            --batch_size ${BATCH_SIZE} --num_epochs ${EPOCHS} \
            --learning_rate ${LR} \
            --multi_seed ${SEEDS} --prefix "${PREFIX}" || exit 1
    done
done
echo "✅ Capacity experiments completed."
