#!/bin/bash
#
# TSP backbone pretraining on YouCook2 — TPU-native launcher.
# Reference: video_backbone/TSP/train/train_tsp_on_yc2.sh (hyperparameters
# kept; torch.distributed.launch over NCCL is replaced by a pjit data mesh
# over all local TPU chips — set MESH_DATA to shard the batch).
#
# usage: DATA_DIR=path/to/yc2/csvs bash scripts/train_tsp_on_yc2.sh

set -e
cd "$(dirname "$0")/.."

DATA_DIR=${DATA_DIR:-data/yc2}
MESH_DATA=${MESH_DATA:-1}

TRAIN_CSV=${TRAIN_CSV:-$DATA_DIR/yc2_train_tsp_groundtruth.csv}
LABEL_COLUMNS="action-label temporal-region-label"
LOSS_ALPHAS="1.0 1.0"
GLOBAL_VIDEO_FEATURES=${GLOBAL_VIDEO_FEATURES:-}

BACKBONE=${BACKBONE:-r2plus1d_34}
BATCH_SIZE=${BATCH_SIZE:-32}
BACKBONE_LR=${BACKBONE_LR:-0.0001}
FC_LR=${FC_LR:-0.002}

OUTPUT_DIR=${OUTPUT_DIR:-save/${BACKBONE}-tsp_on_yc2/backbone_lr_${BACKBONE_LR}-fc_lr_${FC_LR}}
mkdir -p "$OUTPUT_DIR"

GVF_ARG=()
if [ -n "$GLOBAL_VIDEO_FEATURES" ]; then
    GVF_ARG=(--global-video-features "$GLOBAL_VIDEO_FEATURES")
fi

python train_tsp.py \
    --train-csv "$TRAIN_CSV" \
    --label-columns $LABEL_COLUMNS \
    --loss-alphas $LOSS_ALPHAS \
    --backbone "$BACKBONE" \
    --batch-size "$BATCH_SIZE" \
    --backbone-lr "$BACKBONE_LR" \
    --fc-lr "$FC_LR" \
    --mesh-data "$MESH_DATA" \
    --output-dir "$OUTPUT_DIR" \
    "${GVF_ARG[@]}" \
    "$@"
