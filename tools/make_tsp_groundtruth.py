#!/usr/bin/env python
"""Caption annotations -> TSP training groundtruth CSV.

The reference's TSP trainer consumes per-SEGMENT groundtruth CSVs built by
its data tooling (``video_backbone/TSP/data/*_tsp_groundtruth.csv``,
``data/yc2/divide_train.py``): one row per annotated event (foreground,
region label 1) plus one row per >= 8 s gap between events (background,
region label 0, action label missing).  The trainer then samples
``clips_per_segment`` jittered clips inside each segment every epoch
(``train/untrimmed_video_dataset.py:66-78``).

    python tools/make_tsp_groundtruth.py --anno yc2_train.json \
        --video-dir videos/ --out yc2_train_tsp_groundtruth.csv

``--mode clips`` keeps the legacy stride-window table (fixed clip rows
labeled by IoU >= 0.6 — the extraction-side regime,
``video_backbone/untrimmed_video_dataset_2.py:219-237``).
"""
import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvc_tpu.data.video_clips import (assign_clip_labels, make_clip_table,
                                      video_metadata)

FIELDS = ['filename', 'fps', 't-start', 't-end', 'video-duration',
          'action-label', 'temporal-region-label']


def segment_rows(path, fps, duration, timestamps, labels,
                 min_background_sec=8.0):
    """Foreground rows per annotated event + background rows per >= 8 s
    inter-event gap (reference data/yc2/divide_train.py:57-112: background
    segments are [prev_end+1, next_start-1] when at least 8 s long)."""
    rows = []
    for (t0, t1), lab in zip(timestamps, labels):
        rows.append({'filename': path, 'fps': fps, 't-start': t0,
                     't-end': t1, 'video-duration': duration,
                     'action-label': int(lab), 'temporal-region-label': 1})
    cumulate = 0.0
    for t0, t1 in sorted(map(tuple, timestamps)):
        if t0 - 1 - cumulate >= min_background_sec:
            rows.append({'filename': path, 'fps': fps, 't-start': cumulate,
                         't-end': t0 - 1, 'video-duration': duration,
                         'action-label': '', 'temporal-region-label': 0})
        # max() so nested/overlapping events (common in ActivityNet)
        # cannot rewind the cursor and emit background rows that cover an
        # annotated foreground span (the reference iterates in annotation
        # order and has the same rewind bug; fixed here)
        cumulate = max(cumulate, t1 + 1)
    if duration - 1 - cumulate >= min_background_sec:
        # the tail row deliberately ends at `duration`, not duration-1 —
        # byte-for-byte the reference's convention (divide_train.py:85-86)
        rows.append({'filename': path, 'fps': fps, 't-start': cumulate,
                     't-end': duration, 'video-duration': duration,
                     'action-label': '', 'temporal-region-label': 0})
    return rows


def clip_rows(path, fps, n, duration, timestamps, labels, args):
    clips = make_clip_table(path, fps, n, args.clip_len, args.frame_rate,
                            args.stride)
    assign_clip_labels(clips, timestamps, labels)
    return [{'filename': c.filename, 'fps': c.fps, 't-start': c.t_start,
             't-end': c.t_end, 'video-duration': duration,
             'action-label': c.action_label,
             'temporal-region-label': c.region_label} for c in clips]


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--anno', required=True)
    p.add_argument('--video-dir', required=True)
    p.add_argument('--out', required=True)
    p.add_argument('--mode', choices=['segments', 'clips'],
                   default='segments')
    p.add_argument('--clip-len', type=int, default=16)
    p.add_argument('--frame-rate', type=float, default=15)
    p.add_argument('--stride', type=int, default=16,
                   help='clips mode only')
    p.add_argument('--min-background-sec', type=float, default=8.0,
                   help='segments mode: minimum inter-event gap emitted as '
                        'a background segment (reference divide_train.py)')
    args = p.parse_args()

    with open(args.anno) as f:
        anno = json.load(f)
    rows = []
    missing = 0
    for key, entry in anno.items():
        path = None
        for ext in ('.mp4', '.mkv', '.webm', '.avi'):
            cand = os.path.join(args.video_dir, key[:13] + ext)
            if os.path.exists(cand):
                path = cand
                break
        if path is None:
            missing += 1
            continue
        try:
            fps, n, duration = video_metadata(path)
        except IOError:
            missing += 1
            continue
        labels = entry.get('action_labels',
                           [0] * len(entry['timestamps']))
        if args.mode == 'segments':
            rows.extend(segment_rows(path, fps, duration,
                                     entry['timestamps'], labels,
                                     args.min_background_sec))
        else:
            rows.extend(clip_rows(path, fps, n, duration,
                                  entry['timestamps'], labels, args))
    with open(args.out, 'w', newline='') as f:
        w = csv.DictWriter(f, fieldnames=FIELDS)
        w.writeheader()
        w.writerows(rows)
    print(f'{len(rows)} {args.mode} rows from {len(anno) - missing} videos '
          f'({missing} missing) -> {args.out}')
