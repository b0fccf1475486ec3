#!/usr/bin/env python
"""TSP feature extraction driver.

Reference: ``video_backbone/TSP/extract_features/extract_features.py:54-231``.
Decodes stride-``stride`` clips of every video, runs the TSP backbone, and
writes one ``<video_id>.npy`` of clip features per video.  Work divides
across processes with ``--shard-id/--num-shards`` (embarrassingly parallel,
SURVEY.md §2.9) and is idempotent: already-extracted videos are skipped.

    python extract_features.py --video-dir my_videos/ \
        --backbone mvit_v2_s --local-checkpoint mvit_tsp.ckpt \
        --stride 16 --output-dir features/
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    # --data-path is the reference flag name (TSP extract_features/opts.py:31)
    p.add_argument('--video-dir', '--data-path', dest='video_dir',
                   type=str, default=None)
    p.add_argument('--metadata-csv-filename', type=str, default=None)
    p.add_argument('--backbone', type=str, default='mvit_v2_s',
                   choices=['r2plus1d_34', 'r2plus1d_18', 'r3d_18',
                            'mvit_v2_s'])
    p.add_argument('--local-checkpoint', type=str, default=None,
                   help='.ckpt (flax pickle) or .pth (torch) TSP weights')
    p.add_argument('--released-checkpoint', type=str, default=None,
                   help='name of a released TSP checkpoint (reference '
                        'opts.py:43); fetched via tools/fetch_artifacts.py '
                        'when egress exists, then used as --local-checkpoint')
    p.add_argument('--clip-len', type=int, default=16)
    p.add_argument('--frame-rate', type=float, default=15)
    p.add_argument('--stride', type=int, default=16)
    p.add_argument('--batch-size', type=int, default=32)
    p.add_argument('--shard-id', type=int, default=0)
    p.add_argument('--num-shards', type=int, default=1)
    p.add_argument('--output-dir', type=str, required=True)
    p.add_argument('--dtype', type=str, default='bfloat16',
                   choices=['float32', 'bfloat16'],
                   help='compute dtype for extraction (features are '
                        'written as float32 either way)')
    # reference flags with no TPU meaning, accepted so reference command
    # lines run unchanged (decode threading is internal here; the device
    # is whatever jax.default_backend() says)
    p.add_argument('--device', type=str, default=None)
    p.add_argument('--workers', type=int, default=None)
    args = p.parse_args()
    if args.released_checkpoint and not args.local_checkpoint:
        from tools.fetch_artifacts import fetch_released_tsp_checkpoint
        args.local_checkpoint = fetch_released_tsp_checkpoint(
            args.released_checkpoint)
        # the reference derives the backbone from the checkpoint name
        # (extract_features.py:129)
        args.backbone = args.released_checkpoint.split('-')[0]
    return args


def load_videos(args):
    import csv
    if args.metadata_csv_filename:
        with open(args.metadata_csv_filename) as f:
            return [dict(filename=r['filename'], fps=float(r['fps']),
                         frames=int(float(r['video-frames'])))
                    for r in csv.DictReader(f)]
    from dvc_tpu.data.video_clips import video_metadata
    vids = []
    for p in sorted(glob.glob(os.path.join(args.video_dir, '*'))):
        if not p.lower().endswith(('.mp4', '.mkv', '.webm', '.avi')):
            continue
        try:
            fps, n, _ = video_metadata(p)
        except IOError:
            print(f'unreadable video skipped: {p}')
            continue
        vids.append(dict(filename=p, fps=fps, frames=n))
    return vids


def main():
    args = parse_args()
    from dvc_tpu.models.tsp import FeatureExtractor
    from dvc_tpu.train.trainer import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(args.output_dir, exist_ok=True)
    videos = load_videos(args)
    videos = [v for i, v in enumerate(videos)
              if i % args.num_shards == args.shard_id]
    print(f'shard {args.shard_id}/{args.num_shards}: {len(videos)} videos')

    extractor = FeatureExtractor(args.backbone, args.local_checkpoint,
                                 clip_len=args.clip_len, dtype=args.dtype)

    for v in videos:
        vid = os.path.splitext(os.path.basename(v['filename']))[0]
        out_path = os.path.join(args.output_dir, vid[:13] + '.npy')
        if os.path.exists(out_path):
            print(f'already computed: {vid}')
            continue
        feats = extractor.extract_video(
            v['filename'], v['fps'], v['frames'],
            frame_rate=args.frame_rate, stride=args.stride,
            batch_size=args.batch_size)
        if not len(feats):
            print(f'no clips for {vid}')
            continue
        np.save(out_path, feats)
        print(f'{vid}: {feats.shape} -> {out_path}')


if __name__ == '__main__':
    main()
