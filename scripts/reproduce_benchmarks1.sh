#!/bin/bash
# ==============================================================================
# Reproduce the main QuanONet benchmarks (reference
# scripts/reproduce_benchmarks1.sh): Models x Operators x Frequencies x
# Scales, identical hyperparameter tables.
#
# TPU adaptation: the reference loops 5 seeds as separate processes; here
# all 5 seeds train simultaneously as one vmapped program (--multi_seed).
# ==============================================================================
set -u
cd "$(dirname "$0")/.."

NUM_TRAIN=1000
NUM_TEST=1000
BATCH_SIZE=100
LR=0.0001
PREFIX="benchmarks1_reproduction"
SEEDS="0 1 2 3 4"

OPERATORS=("Antideriv" "Homogeneous" "Nonlinear" "RDiffusion" "Advection" "Darcy")
MODELS=("HEAQNN" "QuanONet" "DeepONet" "FNN")
FREQUENCIES=("true" "false")
SCALES=(0.1 0.01 0.001)

echo "🚀 Starting Main Benchmark Experiments (TPU, multi-seed vmap)..."

for OP in "${OPERATORS[@]}"; do
    if [[ "$OP" == "Antideriv" || "$OP" == "Homogeneous" || "$OP" == "Nonlinear" ]]; then
        PROB_TYPE="ODE"; EPOCHS=1000; TRAIN_SAMPLE=10; TEST_SAMPLE=100; PTS=100; PTS_0=100
    elif [ "$OP" == "Darcy" ]; then
        PROB_TYPE="PDE"; EPOCHS=100; TRAIN_SAMPLE=100; TEST_SAMPLE=500; PTS=25; PTS_0=100
    else
        PROB_TYPE="PDE"; EPOCHS=100; TRAIN_SAMPLE=100; TEST_SAMPLE=1000; PTS=100; PTS_0=100
    fi

    echo "▶ Operator: ${OP} (${PROB_TYPE}) | Epochs: ${EPOCHS}"

    for MODEL in "${MODELS[@]}"; do
        if [[ "$MODEL" == "QuanONet" || "$MODEL" == "HEAQNN" ]]; then
            for IF_TF in "${FREQUENCIES[@]}"; do
                NET_SIZE=""
                if [[ "$PROB_TYPE" == "ODE" ]]; then
                    if [[ "$MODEL" == "QuanONet" ]]; then
                        if [[ "$IF_TF" == "true" ]]; then NET_SIZE="20 2 10 2"; else NET_SIZE="20 2 20 2"; fi
                    else
                        if [[ "$IF_TF" == "true" ]]; then NET_SIZE="32 2"; else NET_SIZE="40 2"; fi
                    fi
                else
                    if [[ "$MODEL" == "QuanONet" ]]; then
                        if [[ "$IF_TF" == "true" ]]; then NET_SIZE="40 2 20 2"; else NET_SIZE="40 2 40 2"; fi
                    else
                        if [[ "$IF_TF" == "true" ]]; then NET_SIZE="64 2"; else NET_SIZE="80 2"; fi
                    fi
                fi
                for SCALE in "${SCALES[@]}"; do
                    echo "  [Quantum] ${MODEL} | TF=${IF_TF} | Size=[${NET_SIZE}] | Scale=${SCALE} | seeds {${SEEDS}}"
                    python main.py \
                        --model_type "${MODEL}" --operator "${OP}" \
                        --net_size ${NET_SIZE} \
                        --if_trainable_freq "${IF_TF}" \
                        --scale_coeff "${SCALE}" \
                        --num_train ${NUM_TRAIN} --train_sample_num ${TRAIN_SAMPLE} \
                        --num_test ${NUM_TEST} --test_sample_num ${TEST_SAMPLE} \
                        --batch_size ${BATCH_SIZE} --num_epochs ${EPOCHS} \
                        --learning_rate ${LR} \
                        --num_points ${PTS} --num_points_0 ${PTS_0} \
                        --multi_seed ${SEEDS} \
                        --prefix "${PREFIX}" || exit 1
                done
            done
        else
            NET_SIZE=""
            if [[ "$PROB_TYPE" == "ODE" ]]; then
                if [[ "$MODEL" == "DeepONet" ]]; then NET_SIZE="2 10 2 10"; fi
                if [[ "$MODEL" == "FNN" ]];      then NET_SIZE="2 10"; fi
            else
                if [[ "$MODEL" == "DeepONet" ]]; then NET_SIZE="3 15 3 15"; fi
                if [[ "$MODEL" == "FNN" ]];      then NET_SIZE="3 16"; fi
            fi
            echo "  [Classical] ${MODEL} | Size=[${NET_SIZE}] | seeds {${SEEDS}}"
            python main.py \
                --model_type "${MODEL}" --operator "${OP}" \
                --net_size ${NET_SIZE} \
                --num_train ${NUM_TRAIN} --train_sample_num ${TRAIN_SAMPLE} \
                --num_test ${NUM_TEST} --test_sample_num ${TEST_SAMPLE} \
                --batch_size ${BATCH_SIZE} --num_epochs ${EPOCHS} \
                --learning_rate ${LR} \
                --num_points ${PTS} --num_points_0 ${PTS_0} \
                --multi_seed ${SEEDS} \
                --prefix "${PREFIX}" || exit 1
        fi
    done
done

echo "✅ All experiments completed. Logs saved in ${PREFIX}"
