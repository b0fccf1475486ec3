#!/usr/bin/env bash
# Own-video dense captioning + visualization pipeline.
# Reference: test_and_visualize.sh (metadata csv -> TSP feature extraction
# -> eval on fake captions -> caption-overlay mp4s).
#
# Usage: bash test_and_visualize.sh <video_folder> <output_folder> \
#            <model_run_folder> [language] [tsp_checkpoint]
set -e

video_folder=${1:?video folder}
output_folder=${2:?output folder}
model_folder=${3:?trained run folder (with model-best.ckpt + info.json)}
language=${4:-en}
tsp_checkpoint=${5:-}
backbone=${BACKBONE:-mvit_v2_s}
eval_model=${EVAL_MODEL:-best}

mkdir -p "$output_folder"
feature_dir="$output_folder/features"

# 1. metadata
python - "$video_folder" "$output_folder/metadata.csv" <<'EOF'
import glob, sys
sys.path.insert(0, '.')
from dvc_tpu.data.video_clips import generate_metadata_csv
vids = sorted(p for p in glob.glob(sys.argv[1] + '/*')
              if p.lower().endswith(('.mp4', '.mkv', '.webm', '.avi')))
generate_metadata_csv(vids, sys.argv[2])
EOF

# 2. TSP feature extraction
ckpt_arg=""
if [ -n "$tsp_checkpoint" ]; then ckpt_arg="--local-checkpoint $tsp_checkpoint"; fi
python extract_features.py \
    --metadata-csv-filename "$output_folder/metadata.csv" \
    --backbone "$backbone" --stride "${STRIDE:-16}" \
    --clip-len "${CLIP_LEN:-16}" \
    --output-dir "$feature_dir" $ckpt_arg

# 3. inference with fake captions (language metrics skipped)
python - "$output_folder" "$feature_dir" <<'EOF'
import glob, json, os, sys
sys.path.insert(0, '.')
from eval import create_fake_test_caption_file
keys = [os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(sys.argv[2] + '/*.npy')]
create_fake_test_caption_file(keys, os.path.join(sys.argv[1], 'fake_caption.json'))
EOF
python eval.py --eval_save_dir "$model_folder" --eval_mode test \
    --eval_model "$eval_model" \
    --eval_caption_file "$output_folder/fake_caption.json" \
    --eval_feature_folder "$feature_dir"

# 4. caption overlay rendering
python visualization/visualization.py \
    --dvc_file "$model_folder/dvc_results.json" \
    --video_folder "$video_folder" \
    --output_folder "$output_folder/videos" \
    --output_language "$language"
echo "done: $output_folder/videos"
