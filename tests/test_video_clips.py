"""Clip pipeline tests on a synthesized video (cv2 end to end)."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from dvc_tpu.data.video_clips import (assign_clip_labels, decode_clip,
                                      generate_metadata_csv, iou_interval,
                                      make_clip_table, resample_video_idx,
                                      video_metadata, ClipBatcher)


@pytest.fixture(scope='module')
def video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp('vid') / 'v_synth.mp4')
    fps, n, size = 30.0, 90, (64, 48)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), fps, size)
    for i in range(n):
        frame = np.full((size[1], size[0], 3), i * 2 % 255, np.uint8)
        w.write(frame)
    w.release()
    return path, fps, n


def test_video_metadata(video):
    path, fps, n = video
    got_fps, got_n, dur = video_metadata(path)
    assert abs(got_fps - fps) < 1
    assert abs(got_n - n) <= 2
    assert abs(dur - n / fps) < 0.2


def test_generate_metadata_csv(video, tmp_path):
    path, fps, n = video
    out = str(tmp_path / 'meta.csv')
    rows = generate_metadata_csv([path, '/nonexistent.mp4'], out)
    assert len(rows) == 1
    assert os.path.exists(out)


def test_clip_table_and_labels(video):
    path, fps, n = video
    clips = make_clip_table(path, fps, n, clip_len=16, frame_rate=15,
                            stride=16)
    assert len(clips) >= 2
    # contiguous ~1.07s windows
    assert clips[0].t_start == 0.0
    assert clips[0].t_end == pytest.approx(16 / 15)
    gt = [(0.0, 1.2)]
    assign_clip_labels(clips, gt, [3])
    assert clips[0].action_label == 3 and clips[0].region_label == 1
    assert clips[-1].action_label == -1 and clips[-1].region_label == 0


def test_resample_video_idx():
    idx = resample_video_idx(10, original_fps=30, new_fps=15)
    np.testing.assert_array_equal(idx, np.arange(10) * 2)


def test_decode_clip_shapes(video):
    path, fps, n = video
    x = decode_clip(path, 0.0, clip_len=8, frame_rate=15,
                    resize=(32, 40), crop=(32, 32))
    assert x.shape == (8, 32, 32, 3)
    assert np.isfinite(x).all()
    # past-the-end clip pads by repeating
    x2 = decode_clip(path, 2.8, clip_len=8, frame_rate=15,
                     resize=(32, 40), crop=(32, 32))
    assert x2.shape == (8, 32, 32, 3)


def test_clip_batcher(video):
    path, fps, n = video
    clips = make_clip_table(path, fps, n, clip_len=4, frame_rate=15,
                            stride=8)
    batcher = ClipBatcher(clips, batch_size=4, clip_len=4, frame_rate=15,
                          backbone='r3d_18')
    total = 0
    for x, k, chunk in batcher:
        assert x.shape == (4, 4, 112, 112, 3)
        total += k
    assert total == len(clips)


def test_make_tsp_groundtruth_tool(video, tmp_path):
    import json as _json
    import subprocess
    import sys as _sys
    path, fps, n = video
    vid_dir = os.path.dirname(path)
    key = os.path.splitext(os.path.basename(path))[0]
    anno = {key[:13]: {'duration': n / fps, 'timestamps': [[0.0, 1.2]],
                       'sentences': ['stir']}}
    ap = tmp_path / 'anno.json'
    with open(ap, 'w') as f:
        _json.dump(anno, f)
    out = tmp_path / 'gt.csv'
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, os.path.join(root, 'tools',
                                       'make_tsp_groundtruth.py'),
         '--anno', str(ap), '--video-dir', vid_dir, '--out', str(out),
         '--clip-len', '16', '--stride', '16'],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    import csv as _csv
    with open(out) as f:
        rows = list(_csv.DictReader(f))
    assert rows
    assert rows[0]['temporal-region-label'] == '1'  # first clip in the event
    # the produced csv feeds train_tsp.load_clip_rows
    from train_tsp import load_clip_rows
    clips = load_clip_rows(str(out),
                           ['action-label', 'temporal-region-label'])
    assert clips[0]['labels'] == [0, 1]
