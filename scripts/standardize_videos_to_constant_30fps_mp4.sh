#!/bin/bash
#
# Convert all videos in <input_folder> to constant-30fps mp4s in
# <output_folder> (reference:
# video_backbone/TSP/data/standardize_videos_to_constant_30fps_mp4.sh).
#
# usage: bash scripts/standardize_videos_to_constant_30fps_mp4.sh <in> <out>

if [ "$#" -ne 2 ]; then
    echo "usage: bash $0 <input_folder> <output_folder>"
    exit 1
fi

INPUT_FOLDER=$1
OUTPUT_FOLDER=$2
mkdir -p "$OUTPUT_FOLDER"

for input_video_path in "$INPUT_FOLDER"/*; do
    video_filename=$(basename "$input_video_path")
    video_name="${video_filename%.*}"
    output_video_path="$OUTPUT_FOLDER/$video_name.mp4"
    echo "ffmpeg -y -i $input_video_path -filter:v fps=fps=30 $output_video_path"
    ffmpeg -y -i "$input_video_path" -filter:v fps=fps=30 "$output_video_path"
done
