#!/usr/bin/env python
"""End-to-end evaluation: extract features from the current backbone, then
evaluate PDVC on them.

Reference: ``ete/eval.py:60-201`` (extract_features_ete + evaluate).  The
reference's ``eval_ete.py``/``extract_features_ete.py`` import modules that
do not exist in the repo (SURVEY.md §2.6 — its working e2e surface is
``test_and_visualize.sh``); this driver provides the intended behavior:
re-extract features with a given TSP checkpoint each eval so backbone
updates are reflected.

    python eval_ete.py --eval_save_dir save/yc2_run --video-dir videos/ \
        --tsp-checkpoint save/tsp/tsp-last.ckpt
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--eval_save_dir', required=True)
    p.add_argument('--video-dir', required=True)
    p.add_argument('--tsp-checkpoint', default=None)
    p.add_argument('--backbone', default='mvit_v2_s')
    p.add_argument('--stride', type=int, default=16)
    p.add_argument('--feature-dir', default=None)
    p.add_argument('--eval_caption_file', default=None)
    args = p.parse_args()

    feature_dir = args.feature_dir or os.path.join(
        args.eval_save_dir, f'ete_features_stride_{args.stride}')
    cmd = [sys.executable, 'extract_features.py',
           '--video-dir', args.video_dir, '--backbone', args.backbone,
           '--stride', str(args.stride), '--output-dir', feature_dir]
    if args.tsp_checkpoint:
        cmd += ['--local-checkpoint', args.tsp_checkpoint]
    subprocess.run(cmd, check=True)

    cmd = [sys.executable, 'eval.py', '--eval_save_dir', args.eval_save_dir,
           '--eval_feature_folder', feature_dir]
    if args.eval_caption_file:
        cmd += ['--eval_caption_file', args.eval_caption_file]
    subprocess.run(cmd, check=True)
