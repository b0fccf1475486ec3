"""Caption-overlay renderer smoke test on a synthesized video."""
import json
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from visualization.visualization import (get_frame_caption, render_video,
                                         wrap_text)


def test_get_frame_caption_ranking():
    events = [
        {'timestamp': [0, 10], 'sentence': 'a', 'sentence_score': -1.0,
         'proposal_score': 0.5},
        {'timestamp': [5, 15], 'sentence': 'b', 'sentence_score': -0.1,
         'proposal_score': 0.9},
    ]
    assert get_frame_caption(events, 2.0)['sentence'] == 'a'
    assert get_frame_caption(events, 7.0)['sentence'] == 'b'
    assert get_frame_caption(events, 20.0) is None


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
