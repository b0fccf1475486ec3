#!/bin/bash
#
# TAC baseline (action-classification-only head) on ActivityNet.
# Reference: video_backbone/TSP/train/train_tac_on_activitynet.sh
# (single label column, no temporal-region head, no GVF).
#
# usage: DATA_DIR=path/to/activitynet/csvs bash scripts/train_tac_on_activitynet.sh

set -e
cd "$(dirname "$0")/.."

DATA_DIR=${DATA_DIR:-data/activitynet}
MESH_DATA=${MESH_DATA:-1}

TRAIN_CSV=${TRAIN_CSV:-$DATA_DIR/activitynet_v1-3_train_tsp_groundtruth.csv}

BACKBONE=${BACKBONE:-r2plus1d_34}
BATCH_SIZE=${BATCH_SIZE:-32}
BACKBONE_LR=${BACKBONE_LR:-0.0001}
FC_LR=${FC_LR:-0.002}

OUTPUT_DIR=${OUTPUT_DIR:-save/${BACKBONE}-tac_on_activitynet/backbone_lr_${BACKBONE_LR}-fc_lr_${FC_LR}}
mkdir -p "$OUTPUT_DIR"

python train_tsp.py \
    --train-csv "$TRAIN_CSV" \
    --label-columns action-label \
    --loss-alphas 1.0 \
    --backbone "$BACKBONE" \
    --batch-size "$BATCH_SIZE" \
    --backbone-lr "$BACKBONE_LR" \
    --fc-lr "$FC_LR" \
    --mesh-data "$MESH_DATA" \
    --output-dir "$OUTPUT_DIR" \
    "$@"
