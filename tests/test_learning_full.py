"""Hardened synthetic quality proxy (VERDICT r3 item 9).

``test_learning.py`` proves single-word captions are learnable; this module
drives the FULL train -> eval -> metrics -> model-best loop (``train.py``'s
``train()``, same machinery as ``/root/reference/train.py:149-304``) on a
richer synthetic world — multi-word template captions, variable event
counts per video — and asserts the headline metrics (METEOR, soda_c; the
model-best criterion of reference ``train.py:241-247``) actually improve
over training, for both the flagship LSTM-DSA head and the audio-fusion
model (``newTrain.py``).
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = pytest.mark.slow

VERBS = ['stir', 'chop', 'boil']
NOUNS = ['onion', 'carrot', 'rice']


def make_template_dataset(root, n_videos=12, feat_dim=12, n_frames=24,
                          seed=0):
    """Captions are 'VERB the NOUN'; the verb is planted on channels 0-2,
    the noun on channels 3-5, within the event's span.  Videos carry 1-3
    events at randomized positions (variable counts — the collate pads)."""
    rng = np.random.default_rng(seed)
    feat_dir = os.path.join(root, 'features')
    os.makedirs(feat_dir, exist_ok=True)
    words = sorted(set(VERBS + NOUNS + ['the']))
    vocab = {'ix_to_word': {str(i + 1): w for i, w in enumerate(words)},
             'word_to_ix': {w: i + 1 for i, w in enumerate(words)}}
    vocab_path = os.path.join(root, 'vocab.json')
    with open(vocab_path, 'w') as f:
        json.dump(vocab, f)
    anno = {}
    for v in range(n_videos):
        key = f'v_tmpl{v:07d}'
        duration = 60.0
        feats = (rng.standard_normal((n_frames, feat_dim)) * 0.05
                 ).astype(np.float32)
        n_events = int(rng.integers(1, 4))
        edges = np.sort(rng.uniform(0.05, 0.95, 2 * n_events))
        sents, ts = [], []
        for e in range(n_events):
            a, b = float(edges[2 * e]), float(edges[2 * e + 1])
            b = max(b, a + 0.08)
            vi = int(rng.integers(0, len(VERBS)))
            ni = int(rng.integers(0, len(NOUNS)))
            fs, fe = int(a * n_frames), max(int(b * n_frames),
                                            int(a * n_frames) + 1)
            feats[fs:fe, vi] += 3.0
            feats[fs:fe, 3 + ni] += 3.0
            sents.append(f'{VERBS[vi]} the {NOUNS[ni]}')
            ts.append([a * duration, min(b, 1.0) * duration])
        np.save(os.path.join(feat_dir, key[:13] + '.npy'), feats)
        anno[key] = {'duration': duration, 'timestamps': ts,
                     'sentences': sents}
    anno_path = os.path.join(root, 'train.json')
    with open(anno_path, 'w') as f:
        json.dump(anno, f)
    para_path = os.path.join(root, 'para.json')
    with open(para_path, 'w') as f:
        json.dump({k: '. '.join(v['sentences']) for k, v in anno.items()},
                  f)
    return anno_path, feat_dir, vocab_path, len(words), para_path


def _common_opt(anno, feats, vocab, vsize, para, save_dir, **kw):
    from dvc_tpu.utils.config import load_config
    base = dict(
        save_dir=save_dir, seed=11,
        train_caption_file=anno, val_caption_file=anno,
        gt_file_for_eval=[anno], gt_file_for_para_eval=[para],
        dict_file=vocab, vocab_size=vsize,
        visual_feature_type='tsp', visual_feature_folder=feats,
        feature_dim=12, frame_embedding_num=24, gt_proposal_sample_num=3,
        max_caption_len=6, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=2, transformer_ff_dim=64, num_queries=10,
        input_encoding_size=32, rnn_size=64,
        with_box_refine=True,
        caption_loss_coef=2.0, count_loss_coef=0.5, cls_loss_coef=2.0,
        giou_loss_coef=4.0, bbox_loss_coef=0.0, set_cost_class=2,
        set_cost_bbox=0, set_cost_giou=4,
        batch_size=4, lr=2e-3, epoch=14, save_checkpoint_every=1,
        min_epoch_when_save=-1, max_eseq_length=6,
        learning_rate_decay_start=10, learning_rate_decay_every=2,
        learning_rate_decay_rate=0.5, msda_impl='ref',
        invalid_video_json=[], start_from='', pretrain=None, debug=False,
        ec_alpha=0.3, criteria_for_best_ckpt='dvc',
        eval_tool_version='2018', batch_size_for_eval=4,
        save_all_checkpoint=False, random_seed=False)
    base.update(kw)
    return load_config(**base)


def _score(entry):
    return entry.get('METEOR', 0.0) + entry.get('soda_c', 0.0)


def _assert_metrics_improve(info_path, min_meteor=0.05):
    with open(info_path) as f:
        info = json.load(f)
    hist = info['val_history']
    epochs = sorted(hist, key=int)
    assert len(epochs) >= 3, epochs
    first = _score(hist[epochs[0]])
    late = max(_score(hist[e]) for e in epochs[len(epochs) // 2:])
    # the training signal must show up in the *headline metrics*, not just
    # the loss: late-half best strictly above the first eval, and a
    # non-trivial absolute METEOR on this overfittable world
    assert late > first + 0.01, (first, late, hist)
    best_entry = max(hist.values(), key=_score)
    assert best_entry.get('METEOR', 0.0) > min_meteor, best_entry
    assert info['best_val_score'] >= late - 1e-6
    return hist


def test_flagship_head_metrics_improve(tmp_path):
    """Standard (LSTM-DSA) head on the flagship config shape: METEOR +
    soda_c must improve through the real driver loop, and model-best must
    track the improvement."""
    anno, feats, vocab, vsize, para = make_template_dataset(str(tmp_path))
    from train import train
    opt = _common_opt(anno, feats, vocab, vsize, para,
                      str(tmp_path / 'save'), id='tmpl_standard',
                      caption_decoder_type='standard', att_hid_size=32)
    save_folder = train(opt)
    hist = _assert_metrics_improve(os.path.join(save_folder, 'info.json'))
    assert os.path.exists(os.path.join(save_folder, 'model-best.ckpt'))
    # variable event counts flowed through: some epoch json has videos
    # with differing event counts after reranking
    epoch_jsons = sorted(f for f in os.listdir(save_folder)
                         if f.startswith('epoch') and f.endswith('.json')
                         and 'rerank' in f)
    with open(os.path.join(save_folder, epoch_jsons[-1])) as f:
        dvc = json.load(f)
    counts = {len(v) for v in dvc['results'].values()}
    assert len(counts) > 1, counts


def test_fusion_model_metrics_improve(tmp_path):
    """The audio-fusion model (newTrain.py driver) through the same loop:
    planted sound features must not break learning, and the metrics must
    improve."""
    anno, feats, vocab, vsize, para = make_template_dataset(
        str(tmp_path), n_videos=10)
    sound_dir = tmp_path / 'sound'
    sound_dir.mkdir()
    rng = np.random.default_rng(0)
    with open(anno) as f:
        keys = list(json.load(f).keys())
    # audio present for most videos; the rest exercise the zero-fallback.
    # The fusion cross-attention residual requires sound dim ==
    # fusion_dim (= feature_dim; 768 == 768 in the real recipe)
    for k in keys[:-2]:
        np.save(sound_dir / f'{k[:13]}.npy',
                rng.standard_normal((24, 12)).astype(np.float32))

    from newTrain import main as new_main
    opt = _common_opt(anno, feats, vocab, vsize, para,
                      str(tmp_path / 'save'), id='tmpl_fusion',
                      caption_decoder_type='light', att_hid_size=0,
                      epoch=16, learning_rate_decay_start=12,
                      sound_feature_folder=str(sound_dir),
                      sound_feature_dim=12, ckpt_every_batches=100)
    new_main(opt)
    run_dir = tmp_path / 'save' / 'tmpl_fusion'
    # the fusion model's caption quality saturates lower at these tiny
    # dims (measured METEOR ~0.035 at convergence vs >0.05 for the bare
    # flagship head); the improvement assertion is the load-bearing one
    _assert_metrics_improve(str(run_dir / 'info.json'), min_meteor=0.02)
