#!/bin/bash
# ==============================================================================
# Hamiltonian ablations (reference scripts/reproduce_hamiltonian.sh):
#   1. Pauli basis X/Y/Z          (Q5, Net20-2-10-2)
#   2. Spectral radius ±1..±10    (Q5, Net20-2-10-2)
#   3. Spectral degeneracy        (Q2, Net50-2-50-2, explicit ham_diag)
# ==============================================================================
set -u
cd "$(dirname "$0")/.."

MODEL="QuanONet"
OPERATOR="${1:-Antideriv}"
IF_TF="true"
NUM_TRAIN=1000
NUM_TEST=1000
TRAIN_SAMPLE=10
TEST_SAMPLE=100
BATCH_SIZE=100
LR=0.0001
PREFIX="hamiltonian_reproduction"
SEEDS="0 1 2 3 4"

echo "▶ Branch 1: Pauli Basis Traversal (X, Y, Z)"
for PAULI in X Y Z; do
    echo "  Pauli: ${PAULI} | seeds {${SEEDS}}"
    python main.py \
        --model_type "${MODEL}" --operator "${OPERATOR}" \
        --num_qubits 5 --net_size 20 2 10 2 \
        --if_trainable_freq "${IF_TF}" \
        --ham_pauli "${PAULI}" \
        --num_train ${NUM_TRAIN} --train_sample_num ${TRAIN_SAMPLE} \
        --num_test ${NUM_TEST} --test_sample_num ${TEST_SAMPLE} \
        --batch_size ${BATCH_SIZE} --learning_rate ${LR} \
        --multi_seed ${SEEDS} --prefix "${PREFIX}" || exit 1
done

echo "▶ Branch 2: Spectral Radius Traversal ([-1,1] .. [-10,10])"
for BOUND in 1 2 3 4 5 6 7 8 9 10; do
    echo "  Bound: [-${BOUND}, ${BOUND}] | seeds {${SEEDS}}"
    python main.py \
        --model_type "${MODEL}" --operator "${OPERATOR}" \
        --num_qubits 5 --net_size 20 2 10 2 \
        --if_trainable_freq "${IF_TF}" \
        --ham_bound -${BOUND} ${BOUND} \
        --num_train ${NUM_TRAIN} --train_sample_num ${TRAIN_SAMPLE} \
        --num_test ${NUM_TEST} --test_sample_num ${TEST_SAMPLE} \
        --batch_size ${BATCH_SIZE} --learning_rate ${LR} \
        --multi_seed ${SEEDS} --prefix "${PREFIX}" || exit 1
done

echo "▶ Branch 3: Spectral Degeneracy Traversal (ham_diag, Q2)"
DIAG_LIST=(
    "-5 5 5 5"
    "-5 -5 -5 5"
    "-5 0 0 5"
    "-5 -2.5 2.5 5"
)
for DIAG in "${DIAG_LIST[@]}"; do
    echo "  Diag [${DIAG}] | seeds {${SEEDS}}"
    python main.py \
        --model_type "${MODEL}" --operator "${OPERATOR}" \
        --num_qubits 2 --net_size 50 2 50 2 \
        --if_trainable_freq "${IF_TF}" \
        --ham_diag ${DIAG} \
        --num_train ${NUM_TRAIN} --train_sample_num ${TRAIN_SAMPLE} \
        --num_test ${NUM_TEST} --test_sample_num ${TEST_SAMPLE} \
        --batch_size ${BATCH_SIZE} --learning_rate ${LR} \
        --multi_seed ${SEEDS} --prefix "${PREFIX}" || exit 1
done
echo "✅ Hamiltonian Ablation experiments completed."
