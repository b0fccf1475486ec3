"""Caption-overlay renderer smoke test on a synthesized video."""
import json
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from visualization.visualization import (frame_lines, get_frame_caption,
                                         render_video, wrap_text)

EVENTS = [
    {'timestamp': [0, 10], 'sentence': 'a', 'sentence_score': -1.0,
     'proposal_score': 0.5},
    {'timestamp': [5, 15], 'sentence': 'b', 'sentence_score': -0.1,
     'proposal_score': 0.9},
]


def test_get_frame_caption_ranking():
    assert [e['sentence'] for e in get_frame_caption(EVENTS, 2.0)] == ['a']
    # both cover t=7; b wins the reference joint score (higher sentence
    # score and closer to its midpoint)
    assert [e['sentence'] for e in get_frame_caption(EVENTS, 7.0)] == \
        ['b', 'a']
    assert get_frame_caption(EVENTS, 20.0) == []
    # ranking=False is the show-all path: time-sorted, not score-sorted
    assert [e['sentence'] for e in get_frame_caption(
        EVENTS, 7.0, ranking=False)] == ['a', 'b']


def test_frame_lines_modes():
    # ranked mode paints a time title + up to n_captions covering events
    lines = frame_lines(EVENTS, 7.0, duration=20.0, n_captions=1)
    assert lines[0] == '7.0s/20.0s'
    assert len(lines) == 2 and lines[1].endswith('b')
    # show_all paints every event regardless of coverage (reference
    # show_all_caption_per_frame), time-sorted
    lines = frame_lines(EVENTS, 18.0, duration=20.0, show_all=True)
    assert len(lines) == 3
    assert lines[1].endswith('a') and lines[2].endswith('b')


def test_wrap_text():
    lines = wrap_text('one two three four five six seven', max_chars=10)
    assert all(len(l) <= 11 for l in lines)
    assert ' '.join(lines) == 'one two three four five six seven'


def test_render_video(tmp_path):
    src = str(tmp_path / 'in.mp4')
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*'mp4v'), 10.0, (64, 48))
    for i in range(20):
        w.write(np.full((48, 64, 3), 100, np.uint8))
    w.release()
    events = [{'timestamp': [0, 1.5], 'sentence': 'add the oil',
               'sentence_score': -0.3, 'proposal_score': 0.9}]
    out = str(tmp_path / 'out.mp4')
    render_video(src, events, out, size=(128, 96))
    assert os.path.exists(out)
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) >= 18
    cap.release()
