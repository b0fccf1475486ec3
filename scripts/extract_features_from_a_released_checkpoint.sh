#!/bin/bash
#
# Sharded TSP feature extraction from a checkpoint — TPU-native launcher.
# Reference:
# video_backbone/TSP/extract_features/extract_features_from_a_released_checkpoint.sh.
# Released torch checkpoints are ingested via the converter
# (dvc_tpu/models/tsp/converter.py); fetch them with
# tools/fetch_artifacts.py when egress exists.
#
# usage: DATA_PATH=videos/ METADATA_CSV=meta.csv CHECKPOINT=mvit_tsp.pth \
#        bash scripts/extract_features_from_a_released_checkpoint.sh

set -e
cd "$(dirname "$0")/.."

: "${DATA_PATH:?set DATA_PATH to the video folder}"
: "${METADATA_CSV:?set METADATA_CSV (see generate_metadata_csv in tools/)}"
CHECKPOINT=${CHECKPOINT:-}

BACKBONE=${BACKBONE:-r2plus1d_34}
STRIDE=${STRIDE:-16}
SHARD_ID=${SHARD_ID:-0}
NUM_SHARDS=${NUM_SHARDS:-1}
OUTPUT_DIR=${OUTPUT_DIR:-output/features/${BACKBONE}-stride_${STRIDE}}

mkdir -p "$OUTPUT_DIR"

CKPT_ARG=()
if [ -n "$CHECKPOINT" ]; then
    CKPT_ARG=(--local-checkpoint "$CHECKPOINT")
fi

python extract_features.py \
    --video-dir "$DATA_PATH" \
    --metadata-csv-filename "$METADATA_CSV" \
    --backbone "$BACKBONE" \
    --stride "$STRIDE" \
    --shard-id "$SHARD_ID" \
    --num-shards "$NUM_SHARDS" \
    --output-dir "$OUTPUT_DIR" \
    "${CKPT_ARG[@]}" \
    "$@"
