"""Fusion dataset / loader tests (sound features, visited-video resume)."""
import numpy as np
import os

from dvc_tpu.data.fusion_dataset import (FusionBatchLoader, FusionDataset,
                                         fusion_collate)
from dvc_tpu.utils.config import load_config
from synth import make_synth_dataset


def make_env(tmp_path):
    anno, feats, vocab, vsize = make_synth_dataset(str(tmp_path))
    sound_dir = os.path.join(str(tmp_path), 'sound')
    os.makedirs(sound_dir, exist_ok=True)
    opt = load_config(vocab_size=vsize, visual_feature_type='tsp',
                      feature_dim=16, frame_embedding_num=24,
                      gt_proposal_sample_num=4, max_caption_len=10,
                      invalid_video_json=[], sound_feature_folder=sound_dir)
    return anno, feats, vocab, opt, sound_dir


def test_sound_zero_fallback(tmp_path):
    anno, feats, vocab, opt, sound_dir = make_env(tmp_path)
    ds = FusionDataset(anno, feats, vocab, True, opt,
                       sound_feature_folder=sound_dir)
    s = ds[0]
    assert s['sound'].shape == (24, 768)
    assert np.allclose(s['sound'], 0)  # no cache, no audio -> zeros


def test_sound_cache_loading(tmp_path):
    anno, feats, vocab, opt, sound_dir = make_env(tmp_path)
    ds = FusionDataset(anno, feats, vocab, True, opt,
                       sound_feature_folder=sound_dir)
    key = ds.keys[0][:13]
    cached = np.random.default_rng(0).standard_normal((24, 768)).astype(
        np.float32)
    np.save(os.path.join(sound_dir, key + '.npy'), cached)
    s = ds[0]
    np.testing.assert_allclose(s['sound'], cached)


def test_fusion_collate_and_skip_keys(tmp_path):
    anno, feats, vocab, opt, sound_dir = make_env(tmp_path)
    ds = FusionDataset(anno, feats, vocab, True, opt,
                       sound_feature_folder=sound_dir)
    batch, meta = fusion_collate([ds[0], ds[1]], T=24, G=4, Lc=10)
    assert batch['sound_tensor'].shape == (2, 24, 768)

    visited = set(ds.keys[:4])
    loader = FusionBatchLoader(ds, 2, shuffle=False, opt=opt,
                               skip_keys=visited, drop_last=False)
    seen = []
    for b, m in loader:
        seen.extend(m['keys'])
    assert not (set(seen) & visited)
    assert len(set(seen)) == 2  # 6 videos - 4 visited


def test_csv_clip_segment_join(tmp_path):
    """Clip (start, end) windows come from the TSP metadata CSV joined by
    13-char id (reference NewDataset.py:54-108) — here with stride=8 != 16,
    where uniform windows would be wrong."""
    import csv

    from dvc_tpu.data.fusion_dataset import load_clip_segments_csv

    anno, feats, vocab, vsize = make_synth_dataset(str(tmp_path))
    key13 = 'v_synth000000'     # first synth video id, truncated to 13
    meta_csv = os.path.join(str(tmp_path), 'meta.csv')
    with open(meta_csv, 'w', newline='') as f:
        w = csv.writer(f)
        w.writerow(['filename', 'fps', 'video-frames'])
        w.writerow([f'{key13}.mp4', 30.0, 900])   # 30s video @ 30fps

    # stride 8 at frame_rate 15: resampled stream has 450 frames ->
    # starts every 8/15 s, clip length 16/15 s
    segs = load_clip_segments_csv(meta_csv, clip_len=16, frame_rate=15,
                                  stride=8)
    assert key13 in segs
    s = segs[key13]
    assert abs((s[1][0] - s[0][0]) - 8 / 15) < 1e-6
    assert abs((s[0][1] - s[0][0]) - 16 / 15) < 1e-6
    # uniform windows over 30s with the same clip count would differ
    uniform_step = 30.0 / len(s)
    assert abs(uniform_step - (s[1][0] - s[0][0])) > 1e-3

    class RecordingExtractor:
        def __init__(self):
            self.calls = []

        def extract(self, path, segments, key):
            self.calls.append((path, list(segments), key))
            return np.zeros((len(segments), 768), np.float32)

    audio_dir = os.path.join(str(tmp_path), 'audio')
    os.makedirs(audio_dir, exist_ok=True)
    open(os.path.join(audio_dir, key13 + '.wav'), 'wb').close()

    opt = load_config(vocab_size=vsize, visual_feature_type='tsp',
                      feature_dim=16, frame_embedding_num=24,
                      gt_proposal_sample_num=4, max_caption_len=10,
                      invalid_video_json=[], clip_len=16, frame_rate=15,
                      stride=8, valid_csv_filename=meta_csv)
    rec = RecordingExtractor()
    ds = FusionDataset(anno, feats, vocab, False, opt,
                       audio_folder=audio_dir, extractor=rec)
    idx = [i for i, k in enumerate(ds.keys) if k[:13] == key13][0]
    _ = ds[idx]
    assert rec.calls, 'extractor was not invoked'
    _, used_segs, _ = rec.calls[0]
    # the first windows given to HuBERT are the CSV-joined clip windows
    np.testing.assert_allclose(np.asarray(used_segs[:3]),
                               np.asarray(s[:3]), rtol=1e-6)


def test_labeled_clip_csv_rows(tmp_path):
    import csv

    from dvc_tpu.data.fusion_dataset import load_clip_segments_csv
    p = os.path.join(str(tmp_path), 'clips.csv')
    with open(p, 'w', newline='') as f:
        w = csv.writer(f)
        w.writerow(['filename', 'fps', 'clip-t-start', 'action-label'])
        w.writerow(['vid_abcdef012.mp4', 30.0, 2.5, 1])
        w.writerow(['vid_abcdef012.mp4', 30.0, 4.0, 0])
    segs = load_clip_segments_csv(p, clip_len=16, frame_rate=15, stride=16)
    assert segs['vid_abcdef012'] == [(2.5, 2.5 + 16 / 15),
                                      (4.0, 4.0 + 16 / 15)]
