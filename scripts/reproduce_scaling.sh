#!/bin/bash
# ==============================================================================
# Latent-dimension scaling (reference scripts/reproduce_scaling.sh):
# p = 4..256 <=> Q2..Q8 for TF-QuanONet; DeepONet width doubling from p.
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
PREFIX="scaling_reproduction"
SEEDS="0 1 2 3 4"
OPERATOR="${1:-Antideriv}"

DIM_P_LIST=(4 8 16 32 64 128 256)
HB_LIST=(20 40)
HT_LIST=(10 20)

echo "▶ Branch 1: TF-QuanONet p-scaling"
for P in "${DIM_P_LIST[@]}"; do
    case $P in
        4)   NUM_QUBITS=2 ;;
        8)   NUM_QUBITS=3 ;;
        16)  NUM_QUBITS=4 ;;
        32)  NUM_QUBITS=5 ;;
        64)  NUM_QUBITS=6 ;;
        128) NUM_QUBITS=7 ;;
        256) NUM_QUBITS=8 ;;
    esac
    for HB in "${HB_LIST[@]}"; do
        for HT in "${HT_LIST[@]}"; do
            NET_SIZE="${HB} 2 ${HT} 2"
            echo "  [Quantum] p=${P} (Q${NUM_QUBITS}) | Size=[${NET_SIZE}] | seeds {${SEEDS}}"
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
done

echo "▶ Branch 2: DeepONet p-scaling (width doubling)"
DEPTH_LIST=(3 4)
for P in "${DIM_P_LIST[@]}"; do
    WIDTH=$((P * 2))
    for DEPTH in "${DEPTH_LIST[@]}"; do
        NET_SIZE="${DEPTH} ${WIDTH} ${DEPTH} ${WIDTH} ${P}"
        echo "  [Classical] p=${P} | Size=[${NET_SIZE}] | seeds {${SEEDS}}"
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
echo "✅ Scaling experiments completed."
