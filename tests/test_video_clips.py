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


def test_load_segment_table(tmp_path):
    """Reference untrimmed_video_dataset.py:104-132: clamp to
    [0, video-duration], drop sub-clip-length segments, map labels,
    missing label -> -1."""
    import csv as _csv
    p = tmp_path / 'gt.csv'
    with open(p, 'w', newline='') as f:
        w = _csv.DictWriter(f, fieldnames=[
            'filename', 'fps', 't-start', 't-end', 'video-duration',
            'action-label', 'temporal-region-label'])
        w.writeheader()
        w.writerow({'filename': 'a.mp4', 'fps': 30, 't-start': -2.0,
                    't-end': 99.0, 'video-duration': 10.0,
                    'action-label': 'grilled cheese',
                    'temporal-region-label': 'Action'})
        w.writerow({'filename': 'a.mp4', 'fps': 30, 't-start': 4.0,
                    't-end': 4.5, 'video-duration': 10.0,   # too short
                    'action-label': 'pizza',
                    'temporal-region-label': 'Action'})
        w.writerow({'filename': 'b.mp4', 'fps': 30, 't-start': 0.0,
                    't-end': 9.0, 'video-duration': 10.0,
                    'action-label': '',                      # background
                    'temporal-region-label': 'No action'})
    from dvc_tpu.data.video_clips import load_segment_table
    mappings = [{'grilled cheese': 0, 'pizza': 1},
                {'Action': 1, 'No action': 0}]
    segs = load_segment_table(str(p),
                              ['action-label', 'temporal-region-label'],
                              clip_len=16, frame_rate=15, root_dir='/vids',
                              label_mappings=mappings)
    assert len(segs) == 2                      # short segment dropped
    assert segs[0].t_start == 0.0 and segs[0].t_end == 10.0   # clamped
    assert segs[0].labels == (0, 1)
    assert segs[0].filename == '/vids/a.mp4'
    assert segs[1].labels == (-1, 0)           # missing action -> ignore


def test_segment_clip_sampler_distribution():
    """Pins the clip-sampling regime (reference
    untrimmed_video_dataset.py:66-78): uniform grid without jittering,
    U(0,1) in-segment ratio with it; an epoch visits every segment
    clips_per_segment times."""
    from dvc_tpu.data.video_clips import Segment, SegmentClipSampler
    segs = [Segment('a.mp4', 30, 10.0, 20.0, (0, 1)),
            Segment('b.mp4', 30, 5.0, 8.0, (1, 1))]
    clip_sec = 16 / 15.0
    # uniform grid (validation): ratio = linspace(0,1,3)[idx // n_segs]
    s = SegmentClipSampler(segs, 16, 15, clips_per_segment=3,
                           temporal_jittering=False)
    assert len(s) == 6
    got = [s.clip_at(i) for i in range(6)]
    assert [g[0].filename for g in got] == ['a.mp4', 'b.mp4'] * 3
    spans = {'a.mp4': (10.0, 20.0 - 10.0 - clip_sec),
             'b.mp4': (5.0, 8.0 - 5.0 - clip_sec)}
    for k, (seg, t) in enumerate(got):
        t0, span = spans[seg.filename]
        assert t == pytest.approx(t0 + (k // 2) * 0.5 * span)
    # jittered (training): ratio ~ U(0,1), reproducible from the seed
    sj = SegmentClipSampler(segs, 16, 15, clips_per_segment=3,
                            temporal_jittering=True, seed=42)
    ratios = []
    for rep in range(400):
        for i in range(len(sj)):
            seg, t = sj.clip_at(i)
            t0, span = spans[seg.filename]
            ratios.append((t - t0) / span)
    ratios = np.asarray(ratios)
    assert ratios.min() >= 0 and ratios.max() <= 1
    assert abs(ratios.mean() - 0.5) < 0.02
    assert abs(ratios.std() - (1 / 12) ** 0.5) < 0.02
    # same seed -> same stream (the reference's np.random.RandomState(42))
    sj2 = SegmentClipSampler(segs, 16, 15, clips_per_segment=3,
                             temporal_jittering=True, seed=42)
    assert sj2.clip_at(0)[1] == SegmentClipSampler(
        segs, 16, 15, 3, True, 42).clip_at(0)[1]


def test_decode_clip_random_crop(video):
    """crop_offset selects the window (RandomCrop support)."""
    path, fps, n = video
    a = decode_clip(path, 0.0, 4, 15, resize=(40, 48), crop=(32, 32),
                    crop_offset=(0, 0))
    b = decode_clip(path, 0.0, 4, 15, resize=(40, 48), crop=(32, 32),
                    crop_offset=(8, 16))
    c = decode_clip(path, 0.0, 4, 15, resize=(40, 48), crop=(32, 32))
    assert a.shape == b.shape == c.shape == (4, 32, 32, 3)
    # center crop equals the explicit center offset
    d = decode_clip(path, 0.0, 4, 15, resize=(40, 48), crop=(32, 32),
                    crop_offset=((40 - 32) // 2, (48 - 32) // 2))
    np.testing.assert_array_equal(c, d)


def test_segment_rows_overlapping_events():
    """Nested/overlapping events (common in ActivityNet) must not rewind
    the background cursor: no background row may cover a foreground
    span."""
    import importlib.util
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        'mtg', os.path.join(root, 'tools', 'make_tsp_groundtruth.py'))
    mtg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mtg)
    rows = mtg.segment_rows('v.mp4', 30.0, 120.0,
                            [(0.0, 100.0), (5.0, 10.0)], [1, 2])
    fg = [(r['t-start'], r['t-end']) for r in rows
          if r['temporal-region-label'] == 1]
    bg = [(r['t-start'], r['t-end']) for r in rows
          if r['temporal-region-label'] == 0]
    assert fg == [(0.0, 100.0), (5.0, 10.0)]
    # the only background gap is after the long event
    assert bg == [(101.0, 120.0)]
    for b0, b1 in bg:
        for f0, f1 in fg:
            assert b1 <= f0 or b0 >= f1, (bg, fg)


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
    # default (segments mode): one foreground row per annotated event
    r = subprocess.run(
        [_sys.executable, os.path.join(root, 'tools',
                                       'make_tsp_groundtruth.py'),
         '--anno', str(ap), '--video-dir', vid_dir, '--out', str(out)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    import csv as _csv
    with open(out) as f:
        rows = list(_csv.DictReader(f))
    assert rows
    assert rows[0]['temporal-region-label'] == '1'
    assert float(rows[0]['t-end']) == pytest.approx(1.2)
    # the produced csv feeds the segment loader (the training regime)
    from dvc_tpu.data.video_clips import load_segment_table
    segs = load_segment_table(str(out),
                              ['action-label', 'temporal-region-label'],
                              clip_len=16, frame_rate=15)
    assert segs and segs[0].labels == (0, 1)
    # legacy clips mode still feeds train_tsp.load_clip_rows
    out2 = tmp_path / 'gt_clips.csv'
    r = subprocess.run(
        [_sys.executable, os.path.join(root, 'tools',
                                       'make_tsp_groundtruth.py'),
         '--anno', str(ap), '--video-dir', vid_dir, '--out', str(out2),
         '--mode', 'clips', '--clip-len', '16', '--stride', '16'],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    from train_tsp import load_clip_rows
    clips = load_clip_rows(str(out2),
                           ['action-label', 'temporal-region-label'])
    assert clips[0]['labels'] == [0, 1]
