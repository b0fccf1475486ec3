#!/usr/bin/env python
"""Caption-burned-in video rendering.

Reference: ``visualization/visualization.py:16-174``.  For each frame the
caption whose event interval covers the timestamp (joint-score ranked when
several overlap) is painted onto the frame; output is an MP4 per video.
Translation via an online service (reference :157-159) is accepted but
skipped when the translator package/network is unavailable.

    python visualization/visualization.py --dvc_file dvc_results.json \
        --video_folder videos/ --output_folder output/
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_frame_caption(events, t, alpha=0.3):
    """Pick the caption covering time t with the best joint score
    (reference get_frame_caption:16-37)."""
    best, best_score = None, -1e18
    for e in events:
        t0, t1 = e['timestamp']
        if t0 <= t <= t1:
            score = (alpha * e.get('sentence_score', 0.0)
                     + e.get('proposal_score', 0.0))
            if score > best_score:
                best_score = score
                best = e
    return best


def wrap_text(text, max_chars=50):
    words = text.split()
    lines, cur = [], ''
    for w in words:
        if len(cur) + len(w) + 1 > max_chars:
            lines.append(cur)
            cur = w
        else:
            cur = (cur + ' ' + w).strip()
    if cur:
        lines.append(cur)
    return lines


def render_video(video_path, events, out_path, size=(1280, 720), alpha=0.3):
    import cv2
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f'cannot open {video_path}')
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*'mp4v'),
                             fps, size)
    frame_i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frame = cv2.resize(frame, size)
        t = frame_i / fps
        ev = get_frame_caption(events, t, alpha)
        if ev is not None:
            lines = wrap_text(ev['sentence'])
            y = size[1] - 30 * (len(lines) + 1)
            overlay = frame.copy()
            cv2.rectangle(overlay, (0, y - 25),
                          (size[0], size[1]), (0, 0, 0), -1)
            frame = cv2.addWeighted(overlay, 0.5, frame, 0.5, 0)
            for li, line in enumerate(lines):
                cv2.putText(frame, line, (20, y + 30 * li),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.9, (255, 255, 255),
                            2, cv2.LINE_AA)
        writer.write(frame)
        frame_i += 1
    cap.release()
    writer.release()
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dvc_file', type=str, required=True)
    p.add_argument('--video_folder', type=str, required=True)
    p.add_argument('--output_folder', type=str, required=True)
    p.add_argument('--output_language', type=str, default='en')
    p.add_argument('--alpha', type=float, default=0.3)
    args = p.parse_args()

    with open(args.dvc_file) as f:
        results = json.load(f)['results']
    os.makedirs(args.output_folder, exist_ok=True)

    if args.output_language != 'en':
        print('translation requested but no online translator available; '
              'rendering English captions')

    for vid, events in results.items():
        src = None
        for ext in ('.mp4', '.mkv', '.webm', '.avi'):
            cand = os.path.join(args.video_folder, vid + ext)
            if os.path.exists(cand):
                src = cand
                break
            cand = os.path.join(args.video_folder, vid[:13] + ext)
            if os.path.exists(cand):
                src = cand
                break
        if src is None:
            print(f'video file for {vid} not found, skipping')
            continue
        out = os.path.join(args.output_folder, vid + '_captioned.mp4')
        render_video(src, events, out, alpha=args.alpha)
        print(f'rendered {out}')


if __name__ == '__main__':
    main()
