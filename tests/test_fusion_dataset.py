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
