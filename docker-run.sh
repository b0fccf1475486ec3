#!/usr/bin/env bash
# Run the container with data and checkpoints mounted
# (reference docker-run.sh equivalent).
data_dir=${1:-$(pwd)/data}
save_dir=${2:-$(pwd)/save}
docker run --rm -it \
    -v "$data_dir":/workspace/data \
    -v "$save_dir":/workspace/save \
    dvc_tpu "${@:3}"
