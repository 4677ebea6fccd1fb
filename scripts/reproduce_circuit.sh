#!/bin/bash
# ==============================================================================
# Circuit-size study (reference scripts/reproduce_circuit.sh): qubit counts
# {2, 5, 10} with qubit-dependent branch-depth grids.
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
PREFIX="circuit_reproduction"
SEEDS="0 1 2 3 4"
OPERATOR="${1:-Antideriv}"

QUBIT_CASES=(2 5 10)
HT_LIST=(10 20 30 40)

for N_Q in "${QUBIT_CASES[@]}"; do
    case $N_Q in
        2)  HB_LIST=(50 100) ;;
        5)  HB_LIST=(20 40) ;;
        10) HB_LIST=(10 20) ;;
    esac
    echo "▶ TF-QuanONet | Qubits: ${N_Q} | HB: ${HB_LIST[*]} | HT: ${HT_LIST[*]}"
    for HB in "${HB_LIST[@]}"; do
        for HT in "${HT_LIST[@]}"; do
            NET_SIZE="${HB} 2 ${HT} 2"
            echo "  Q${N_Q} | Size=[${NET_SIZE}] | seeds {${SEEDS}}"
            python main.py \
                --model_type QuanONet --operator "${OPERATOR}" \
                --num_qubits ${N_Q} --net_size ${NET_SIZE} \
                --if_trainable_freq true \
                --num_train ${NUM_TRAIN} --train_sample_num ${TRAIN_SAMPLE} \
                --num_test ${NUM_TEST} --test_sample_num ${TEST_SAMPLE} \
                --batch_size ${BATCH_SIZE} --num_epochs ${EPOCHS} \
                --learning_rate ${LR} \
                --multi_seed ${SEEDS} --prefix "${PREFIX}" || exit 1
        done
    done
done
echo "✅ Circuit experiments completed."
