"""Learning-capability test: on a synthetic dataset where the caption is a
deterministic function of a feature signature, the trained model must
produce captions containing the right word and localize events.

This is the correctness check that quality-metric parity builds on (real
YC2 data is not available in CI)."""
import json
import os

import jax
import numpy as np
import pytest

from dvc_tpu.data import BatchLoader, DenseCaptionDataset
from dvc_tpu.models import postprocess, to_dvc_records
from dvc_tpu.train import Trainer, multistep_lr
from dvc_tpu.utils.config import load_config


WORD_FOR_CHANNEL = ['stir', 'chop', 'boil', 'fry']


def make_learnable_dataset(root, n_videos=12, feat_dim=8, n_frames=24,
                           seed=0):
    """Each video has 2 events; the event's dominant feature channel
    determines its one-word caption."""
    rng = np.random.default_rng(seed)
    feat_dir = os.path.join(root, 'features')
    os.makedirs(feat_dir, exist_ok=True)
    words = sorted(set(WORD_FOR_CHANNEL)) + ['UNK']
    vocab = {'ix_to_word': {str(i + 1): w for i, w in enumerate(words)},
             'word_to_ix': {w: i + 1 for i, w in enumerate(words)}}
    vocab_path = os.path.join(root, 'vocab.json')
    with open(vocab_path, 'w') as f:
        json.dump(vocab, f)
    anno = {}
    for v in range(n_videos):
        key = f'v_learn{v:06d}'
        duration = 48.0
        feats = rng.standard_normal((n_frames, feat_dim)).astype(
            np.float32) * 0.05
        spans = [(0.15, 0.35), (0.6, 0.85)]
        sents, ts = [], []
        for (a, b) in spans:
            ch = int(rng.integers(0, len(WORD_FOR_CHANNEL)))
            s, e = a * duration, b * duration
            fs, fe = int(a * n_frames), int(b * n_frames)
            feats[fs:fe, ch] += 3.0
            sents.append(WORD_FOR_CHANNEL[ch])
            ts.append([s, e])
        np.save(os.path.join(feat_dir, key[:13] + '.npy'), feats)
        anno[key] = {'duration': duration, 'timestamps': ts,
                     'sentences': sents}
    anno_path = os.path.join(root, 'train.json')
    with open(anno_path, 'w') as f:
        json.dump(anno, f)
    return anno_path, feat_dir, vocab_path, len(words)


@pytest.mark.slow
@pytest.mark.parametrize('head', ['light', 'standard'])
def test_model_learns_captions_and_localization(tmp_path, head):
    """'light' covers the default head; 'standard' covers the flagship
    LSTM-DSA head through the fused word step (dsa_lstm_fuse forced on so
    the fused path gets end-to-end learning coverage; ref impl on CPU)."""
    anno, feats, vocab, vsize = make_learnable_dataset(str(tmp_path))
    opt = load_config(
        vocab_size=vsize, visual_feature_type='tsp', feature_dim=8,
        frame_embedding_num=24, gt_proposal_sample_num=2, max_caption_len=5,
        invalid_video_json=[], hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=2, transformer_ff_dim=64, num_queries=8,
        input_encoding_size=32, rnn_size=64,
        att_hid_size=0 if head == 'light' else 32,
        dsa_lstm_fuse=0 if head == 'light' else 1,
        with_box_refine=True, caption_decoder_type=head,
        caption_loss_coef=2.0, count_loss_coef=0.5, cls_loss_coef=2.0,
        giou_loss_coef=4.0, bbox_loss_coef=0.0, set_cost_class=2,
        set_cost_bbox=0, set_cost_giou=4, batch_size=4, lr=2e-3,
        epoch=30, learning_rate_decay_start=20,
        learning_rate_decay_every=5, learning_rate_decay_rate=0.5,
        msda_impl='ref', max_eseq_length=5)
    ds = DenseCaptionDataset(anno, feats, vocab, True, opt)
    loader = BatchLoader(ds, opt.batch_size, shuffle=True, opt=opt)
    trainer = Trainer(opt)
    batch0, _ = next(iter(loader))
    state = trainer.init_state(batch0)
    rng = jax.random.PRNGKey(0)
    for epoch in range(opt.epoch):
        lr = multistep_lr(opt, epoch)
        for batch, meta in loader:
            rng, r = jax.random.split(rng)
            state, losses = trainer.train_step(state, batch, lr, 0.0, r)

    # evaluate on the training videos (overfit regime): captions must name
    # the planted word, events must cover the gt spans
    import jax.numpy as jnp
    eval_loader = BatchLoader(ds, opt.batch_size, shuffle=False, opt=opt,
                              drop_last=False)
    word_hits = word_total = 0
    loc_hits = loc_total = 0
    with open(anno) as f:
        gt = json.load(f)
    for batch, meta in eval_loader:
        out, _ = trainer.eval_step(state, batch)
        post = postprocess(out, jnp.asarray(meta['durations'], jnp.float32))
        records = to_dvc_records(post, meta['keys'], meta['durations'],
                                 ds.translator)
        for vid, events in records.items():
            truth = gt[vid]
            top = sorted(events, key=lambda e: e['proposal_score'],
                         reverse=True)[:2]
            for ts, sent in zip(truth['timestamps'], truth['sentences']):
                word_total += 1
                if any(sent.split()[0] in e['sentence'] for e in top):
                    word_hits += 1
                loc_total += 1
                from dvc_tpu.eval import iou_1d
                if any(iou_1d(e['timestamp'], ts) > 0.5 for e in top):
                    loc_hits += 1
    assert word_hits / word_total > 0.6, (word_hits, word_total)
    assert loc_hits / loc_total > 0.6, (loc_hits, loc_total)
