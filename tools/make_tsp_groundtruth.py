#!/usr/bin/env python
"""Caption annotations -> TSP training groundtruth CSV.

The reference's TSP trainer consumes per-clip groundtruth CSVs built by its
data tooling (``video_backbone/TSP/data/*_tsp_groundtruth.csv``,
``data/yc2/divide_train.py``).  This produces the same table from a caption
annotation JSON + a video folder: stride clips over each video, labeled by
IoU >= 0.6 with the annotated event segments (action label optional —
captions have a single foreground class by default).

    python tools/make_tsp_groundtruth.py --anno yc2_train.json \
        --video-dir videos/ --out yc2_train_tsp_groundtruth.csv
"""
import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvc_tpu.data.video_clips import (assign_clip_labels, make_clip_table,
                                      video_metadata)

if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--anno', required=True)
    p.add_argument('--video-dir', required=True)
    p.add_argument('--out', required=True)
    p.add_argument('--clip-len', type=int, default=16)
    p.add_argument('--frame-rate', type=float, default=15)
    p.add_argument('--stride', type=int, default=16)
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
            fps, n, _ = video_metadata(path)
        except IOError:
            missing += 1
            continue
        clips = make_clip_table(path, fps, n, args.clip_len,
                                args.frame_rate, args.stride)
        labels = entry.get('action_labels',
                           [0] * len(entry['timestamps']))
        assign_clip_labels(clips, entry['timestamps'], labels)
        for c in clips:
            rows.append({'filename': c.filename, 'fps': c.fps,
                         't-start': c.t_start, 't-end': c.t_end,
                         'action-label': c.action_label,
                         'temporal-region-label': c.region_label})
    with open(args.out, 'w', newline='') as f:
        w = csv.DictWriter(f, fieldnames=['filename', 'fps', 't-start',
                                          't-end', 'action-label',
                                          'temporal-region-label'])
        w.writeheader()
        w.writerows(rows)
    print(f'{len(rows)} clips from {len(anno) - missing} videos '
          f'({missing} missing) -> {args.out}')
