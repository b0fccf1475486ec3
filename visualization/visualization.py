#!/usr/bin/env python
"""Caption-burned-in video rendering.

Reference: ``visualization/visualization.py:16-174``.  Per frame, the
events covering the timestamp are ranked by the reference's joint score
(``get_frame_caption:16-37``: length-normalized sentence score + a
proposal score weighted by distance from the event midpoint) and the top
``--n_captions`` (3, like the reference) are painted onto the frame;
``--show_all_caption_per_frame`` instead lists every event time-sorted
(reference ``:124-131``).  Output is an MP4 per video.  Translation via
an online service (reference ``:157-159``) is accepted but skipped when
the translator package/network is unavailable (zero-egress deviation,
PARITY.md).

    python visualization/visualization.py --dvc_file dvc_results.json \
        --input_mp4_folder videos/ --output_mp4_folder output/

(``--video_folder`` / ``--output_folder`` are accepted as aliases of the
reference's ``--input_mp4_folder`` / ``--output_mp4_folder``.)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rank_score(e, t):
    """The reference's joint ranking score for a caption at frame time t
    (visualization.py:27-30): length-normalized sentence score plus the
    proposal score discounted by distance from the event midpoint."""
    t0, t1 = e['timestamp']
    n_words = float(len(e.get('sentence', '').split()))
    sent = e.get('sentence_score', 0.0) / (n_words + 1e-5)
    prox = 1.0 - abs(t - 0.5 * (t0 + t1)) / (t1 - t0 + 1e-8)
    return sent + 1.0 * e.get('proposal_score', 0.0) * prox


def get_frame_caption(events, t, ranking=True):
    """Events covering time t; joint-score ranked (reference
    get_frame_caption:16-37) or time-sorted when ranking=False."""
    covering = [e for e in events
                if e['timestamp'][0] <= t <= e['timestamp'][1]]
    if ranking:
        return sorted(covering, key=lambda e: rank_score(e, t),
                      reverse=True)
    return sorted(covering, key=lambda e: e['timestamp'])


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


def frame_lines(events, t, duration, n_captions=3, show_all=False):
    """The text lines painted on a frame at time t: a time title plus up
    to n_captions ranked covering events (or every event, time-sorted,
    when show_all — reference :124-131), each prefixed with its span."""
    lines = ['{:.1f}s/{:.1f}s'.format(t, duration)]
    if show_all:
        shown = sorted(events, key=lambda e: e['timestamp'])
    else:
        shown = get_frame_caption(events, t, ranking=True)[:n_captions]
    for e in shown:
        t0, t1 = e['timestamp']
        head = '[{:.1f}s-{:.1f}s] '.format(t0, t1)
        wrapped = wrap_text(e.get('sentence', ''), max_chars=60)
        lines.append(head + (wrapped[0] if wrapped else ''))
        lines.extend('    ' + w for w in wrapped[1:])
    return lines


def render_video(video_path, events, out_path, size=(1280, 720),
                 n_captions=3, show_all=False, duration=None):
    import cv2
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f'cannot open {video_path}')
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    if duration is None:
        n_frames = cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0
        duration = n_frames / fps if n_frames else 0.0
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*'mp4v'),
                             fps, size)
    frame_i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frame = cv2.resize(frame, size)
        t = frame_i / fps
        lines = frame_lines(events, t, duration, n_captions, show_all)
        if len(lines) > 1:
            y = size[1] - 30 * (len(lines) + 1)
            overlay = frame.copy()
            cv2.rectangle(overlay, (0, y - 25),
                          (size[0], size[1]), (0, 0, 0), -1)
            frame = cv2.addWeighted(overlay, 0.5, frame, 0.5, 0)
            for li, line in enumerate(lines):
                cv2.putText(frame, line, (20, y + 30 * li),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 255),
                            2, cv2.LINE_AA)
        writer.write(frame)
        frame_i += 1
    cap.release()
    writer.release()
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dvc_file', type=str, required=True)
    # reference flag names (visualization.py:152-153) with this repo's
    # earlier names kept as aliases
    p.add_argument('--input_mp4_folder', '--video_folder',
                   dest='video_folder', type=str, required=True)
    p.add_argument('--output_mp4_folder', '--output_folder',
                   dest='output_folder', type=str, required=True)
    p.add_argument('--output_language', type=str, default='en')
    p.add_argument('--show_all_caption_per_frame', type=int, default=0)
    p.add_argument('--n_captions', type=int, default=3,
                   help='ranked captions painted per frame (reference '
                        'shows min(3, covering))')
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
        render_video(src, events, out, n_captions=args.n_captions,
                     show_all=bool(args.show_all_caption_per_frame))
        print(f'rendered {out}')


if __name__ == '__main__':
    main()
