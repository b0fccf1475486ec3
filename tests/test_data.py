"""Dataset / collate / vocabulary tests."""
import json

import numpy as np
import pytest

from dvc_tpu.data import (BatchLoader, DenseCaptionDataset, Translator,
                          build_vocab, collate, resize_feature)
from dvc_tpu.utils.config import load_config
from synth import make_synth_dataset


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp('synth')
    return make_synth_dataset(str(root)), str(root)


def make_opt(synth_info, **kw):
    anno, feats, vocab, vsize = synth_info
    d = dict(vocab_size=vsize, visual_feature_type='tsp', feature_dim=16,
             frame_embedding_num=24, gt_proposal_sample_num=5,
             max_caption_len=10, invalid_video_json=[], data_rescale=1,
             sample_method='nearest', data_norm=0, feature_sample_rate=1)
    d.update(kw)
    return load_config(**d)


def test_resize_feature_shapes():
    x = np.arange(20, dtype=np.float32).reshape(10, 2)
    for m in ('nearest', 'linear'):
        y = resize_feature(x, 24, m)
        assert y.shape == (24, 2)
        # endpoints preserved
        np.testing.assert_allclose(y[0], x[0])
        np.testing.assert_allclose(y[-1], x[-1])
    y1 = resize_feature(x[:1], 5, 'nearest')
    assert y1.shape == (5, 2)


def test_translator_roundtrip(synth):
    info, root = synth
    _, _, vocab_path, vsize = info
    tr = Translator(vocab_path, vsize)
    ids = tr.translate('add the mix', 10)
    assert ids[0] == 0 and ids[-1] == 0
    assert tr.rtranslate(ids[1:]) == 'add the mix.'
    # OOV -> UNK id == vocab_size
    ids2 = tr.translate('xyzzy', 10)
    assert ids2[1] == vsize


def test_dataset_and_collate(synth):
    info, root = synth
    anno, feats, vocab, vsize = info
    opt = make_opt(info)
    ds = DenseCaptionDataset(anno, feats, vocab, True, opt)
    assert len(ds) == 6
    s = ds[0]
    assert s['feats'].shape == (24, 16)
    batch, meta = collate([ds[0], ds[1]], T=24, G=5, Lc=10)
    assert batch['video_tensor'].shape == (2, 24, 16)
    assert batch['gt_boxes'].shape == (2, 5, 2)
    assert batch['cap_tensor'].shape == (2, 5, 10)
    g = int(batch['gt_boxes_mask'][0].sum())
    assert g == len(meta['raw_timestamps'][0])
    # boxes normalized (center, length) in (0, 1]
    m = batch['gt_boxes_mask']
    assert (batch['gt_boxes'][m][:, 1] > 0).all()
    assert (batch['gt_boxes'][m] <= 1.0 + 1e-6).all()
    # captions start with BOS and are masked consistently
    assert (batch['cap_tensor'][:, :, 0][m] == 0).all()
    assert (batch['cap_mask'][m][:, 0]).all()


def test_batch_loader(synth):
    info, root = synth
    anno, feats, vocab, vsize = info
    opt = make_opt(info, batch_size=4)
    ds = DenseCaptionDataset(anno, feats, vocab, True, opt)
    loader = BatchLoader(ds, 4, shuffle=True, opt=opt)
    batches = list(loader)
    assert len(batches) == 1  # 6 videos, drop_last
    b, meta = batches[0]
    assert b['video_tensor'].shape[0] == 4


def test_build_vocab(tmp_path, synth):
    info, root = synth
    anno, _, _, _ = info
    vocab = build_vocab([anno], count_thr=1)
    assert 'UNK' in vocab['word_to_ix']
    assert '<bos>' in vocab['word_to_ix']
    # ids are 1-based and consistent
    for w, i in vocab['word_to_ix'].items():
        assert vocab['ix_to_word'][str(i)] == w


def test_missing_feature_zero_pads(synth, tmp_path):
    info, root = synth
    anno, feats, vocab, vsize = info
    with open(anno) as f:
        a = json.load(f)
    # add a video with no feature file
    a['v_missing0001'] = {'duration': 10.0, 'timestamps': [[1, 3]],
                          'sentences': ['add salt']}
    p = tmp_path / 'train.json'
    with open(p, 'w') as f:
        json.dump(a, f)
    opt = make_opt(info)
    ds = DenseCaptionDataset(str(p), feats, vocab, True, opt)
    s = ds[len(ds) - 1]
    assert s['key'] == 'v_missing0001'
    assert np.allclose(s['feats'], 0)
