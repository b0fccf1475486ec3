"""Evaluation-stack tests: scorers, SODA DP vs brute force, protocols."""
import itertools
import json

import numpy as np
import pytest

from dvc_tpu.eval import (Bleu, Cider, Meteor, Rouge, chased_dp_assignment,
                          eval_dvc, eval_metrics, eval_para, eval_soda,
                          iou_1d, porter_stem, ptb_tokenize, reranking)


# ---------------------------------------------------------------- scorers
def test_ptb_tokenize():
    assert ptb_tokenize("A man is Cooking, with oil.") == 'a man is cooking with oil'
    assert ptb_tokenize("it's hot!") == "it 's hot"


def test_porter_stem():
    cases = {'caresses': 'caress', 'ponies': 'poni', 'cats': 'cat',
             'feed': 'feed', 'agreed': 'agre', 'plastered': 'plaster',
             'motoring': 'motor', 'sing': 'sing', 'conflated': 'conflat',
             'happy': 'happi', 'relational': 'relat'}
    for w, s in cases.items():
        assert porter_stem(w) == s, (w, porter_stem(w), s)


def test_bleu_perfect_match():
    gts = {0: ['the cat sat on the mat']}
    res = {0: ['the cat sat on the mat']}
    score, _ = Bleu(4).compute_score(gts, res)
    assert all(abs(s - 1.0) < 1e-6 for s in score)


def test_bleu_orders():
    gts = {0: ['the cat sat on the mat'], 1: ['a dog runs fast']}
    res = {0: ['the cat sat on a mat'], 1: ['dog runs']}
    score, per = Bleu(4).compute_score(gts, res)
    assert 0 < score[0] <= 1
    assert score[3] <= score[0] + 1e-9
    assert len(per[0]) == 2


def test_meteor_monotonic():
    gts = {0: ['add the chopped onion to the hot pan']}
    perfect, _ = Meteor().compute_score(gts, {0: ['add the chopped onion to the hot pan']})
    partial, _ = Meteor().compute_score(gts, {0: ['add the onion']})
    junk, _ = Meteor().compute_score(gts, {0: ['zebra quantum flux']})
    assert perfect > partial > junk
    assert junk == 0.0
    # METEOR 1.5's fragmentation penalty bounds even identical sentences:
    # 1 - gamma * (1/m)^beta = 1 - 0.6 * (1/8)^0.2 ~= 0.60 for m=8 matches
    assert 0.55 < perfect < 0.75


def test_meteor_stem_matching():
    # 'chopping' vs 'chopped' only match via stemming
    gts = {0: ['chopped onions']}
    s_stem, _ = Meteor().compute_score(gts, {0: ['chopping onions']})
    s_none, _ = Meteor().compute_score(gts, {0: ['warm water']})
    assert s_stem > s_none


def test_rouge_and_cider():
    gts = {0: ['the cat sat on the mat'], 1: ['a dog runs fast']}
    res = {0: ['the cat sat on the mat'], 1: ['a dog walks slowly']}
    r, per_r = Rouge().compute_score(gts, res)
    assert per_r[0] == pytest.approx(1.0)
    c, per_c = Cider().compute_score(gts, res)
    assert per_c[0] > per_c[1]


# ---------------------------------------------------------------- SODA DP
def brute_force_assignment(scores):
    """Max-sum monotonic matching by exhaustive search."""
    M, N = scores.shape
    best = 0.0
    rows = list(range(M))
    cols = list(range(N))
    for k in range(0, min(M, N) + 1):
        for rs in itertools.combinations(rows, k):
            for cs in itertools.combinations(cols, k):
                best = max(best, sum(scores[i, j] for i, j in zip(rs, cs)))
    return best


@pytest.mark.parametrize("seed", range(5))
def test_chased_dp_vs_brute_force(seed):
    rng = np.random.default_rng(seed)
    scores = rng.uniform(0, 1, (4, 5))
    got, pairs = chased_dp_assignment(scores)
    want = brute_force_assignment(scores)
    assert got == pytest.approx(want, abs=1e-9)
    # pairs must be strictly monotonic
    for (i0, j0), (i1, j1) in zip(pairs, pairs[1:]):
        assert i1 > i0 and j1 > j0


# ------------------------------------------------------------- protocols
@pytest.fixture()
def gt_and_pred(tmp_path):
    gt = {
        'v_test0001': {
            'duration': 60.0,
            'timestamps': [[0, 10], [20, 35], [40, 55]],
            'sentences': ['add oil to the pan', 'chop the onions',
                          'stir the mixture'],
        },
        'v_test0002': {
            'duration': 30.0,
            'timestamps': [[0, 15], [15, 30]],
            'sentences': ['boil the water', 'add the pasta'],
        },
    }
    gt_path = tmp_path / 'gt.json'
    with open(gt_path, 'w') as f:
        json.dump(gt, f)
    pred = {'results': {
        'v_test0001': [
            {'timestamp': [0.5, 9.5], 'sentence': 'add oil to the pan',
             'proposal_score': 0.9, 'sentence_score': -0.5,
             'query_id': 0, 'pred_event_count': 3},
            {'timestamp': [21, 34], 'sentence': 'chop the onions',
             'proposal_score': 0.8, 'sentence_score': -0.7,
             'query_id': 1, 'pred_event_count': 3},
            {'timestamp': [41, 54], 'sentence': 'stir the mixture',
             'proposal_score': 0.7, 'sentence_score': -0.4,
             'query_id': 2, 'pred_event_count': 3},
        ],
        'v_test0002': [
            {'timestamp': [1, 14], 'sentence': 'boil the water',
             'proposal_score': 0.9, 'sentence_score': -0.3,
             'query_id': 0, 'pred_event_count': 2},
            {'timestamp': [16, 29], 'sentence': 'add the pasta',
             'proposal_score': 0.85, 'sentence_score': -0.2,
             'query_id': 1, 'pred_event_count': 2},
        ],
    }}
    pred_path = tmp_path / 'pred.json'
    with open(pred_path, 'w') as f:
        json.dump(pred, f)
    # paragraph gt
    para = {k: ' '.join(v['sentences']) for k, v in gt.items()}
    para_path = tmp_path / 'para.json'
    with open(para_path, 'w') as f:
        json.dump(para, f)
    return str(gt_path), str(pred_path), str(para_path)


def test_eval_dvc_perfect(gt_and_pred):
    gt_path, pred_path, _ = gt_and_pred
    scores = eval_dvc(pred_path, [gt_path], verbose=True)
    # near-perfect predictions: recall/precision 1 at low tIoU
    assert scores['Recall'][0] == pytest.approx(1.0)
    assert scores['Precision'][0] == pytest.approx(1.0)
    assert scores['METEOR'][0] > 0.5
    assert scores['CIDEr'][0] > 1.0


def test_eval_dvc_garbage_predictions(gt_and_pred, tmp_path):
    gt_path, _, _ = gt_and_pred
    bad = {'results': {'v_test0001': [
        {'timestamp': [55, 60], 'sentence': 'nonsense words here',
         'proposal_score': 0.5, 'sentence_score': -2.0, 'query_id': 0,
         'pred_event_count': 1}],
        'v_test0002': [
        {'timestamp': [29, 30], 'sentence': 'more junk',
         'proposal_score': 0.5, 'sentence_score': -2.0, 'query_id': 0,
         'pred_event_count': 1}]}}
    p = tmp_path / 'bad.json'
    with open(p, 'w') as f:
        json.dump(bad, f)
    scores = eval_dvc(str(p), [gt_path], verbose=True)
    assert scores['METEOR'][0] < 0.05
    assert scores['Recall'][-1] == 0.0


def test_eval_soda(gt_and_pred):
    gt_path, pred_path, _ = gt_and_pred
    out = eval_soda(pred_path, [gt_path])
    # per-pair ceiling is IoU (~0.85) x METEOR-with-frag-penalty (~0.6)
    assert 0.3 < out['soda_c'] <= 1.0


def test_eval_para(gt_and_pred):
    gt_path, pred_path, para_path = gt_and_pred
    out = eval_para(pred_path, [para_path])
    assert out['para_METEOR'] > 0.5
    assert out['para_Bleu_4'] > 0.5


def test_eval_metrics_aggregate(gt_and_pred):
    gt_path, pred_path, para_path = gt_and_pred
    scores = eval_metrics(pred_path, [gt_path], [para_path], rerank=False)
    for k in ['METEOR', 'soda_c', 'para_METEOR', 'Recall', 'Precision']:
        assert k in scores
    assert scores['METEOR'] > 0.3  # mean over tIoUs


def test_reranking(gt_and_pred, tmp_path):
    gt_path, pred_path, _ = gt_and_pred
    out = reranking(pred_path, alpha=0.3, temperature=2.0)
    with open(out) as f:
        d = json.load(f)
    v = d['results']['v_test0001']
    assert len(v) == 3  # pred_event_count
    # sorted by time after rerank
    starts = [p['timestamp'][0] for p in v]
    assert starts == sorted(starts)


def test_iou_1d():
    assert iou_1d([0, 10], [0, 10]) == pytest.approx(1.0, abs=1e-6)
    assert iou_1d([0, 10], [5, 15]) == pytest.approx(1 / 3, abs=1e-3)
    assert iou_1d([0, 10], [20, 30]) == 0.0


def test_eval_soda_types(gt_and_pred):
    """soda a/b/d variants (reference soda.py:121-139): near-perfect
    predictions score high everywhere; soda_d ignores captions entirely."""
    gt_path, pred_path, _ = gt_and_pred
    out_b = eval_soda(pred_path, [gt_path], soda_type='b')
    out_d = eval_soda(pred_path, [gt_path], soda_type='d')
    out_a = eval_soda(pred_path, [gt_path], soda_type='a')
    # b: DP on IoU, scored by METEOR over the chosen pairs
    assert 0.3 < out_b['soda_b'] <= 1.0
    # d: pure IoU F-measure; our boxes overlap ~0.85+
    assert 0.7 < out_d['soda_d'] <= 1.0
    # a averages over tIoU in {0.9,0.7,0.5,0.3}; the 0.9 slot loses pairs
    assert 0.0 < out_a['soda_a'] <= out_b['soda_b'] + 1e-9


def test_eval_soda_alternate_scorers(gt_and_pred):
    gt_path, pred_path, _ = gt_and_pred
    # BLEU-4 is tiny on 3-4 word sentences (no 4-grams to match)
    for scorer, lo in [('Cider', 0.3), ('Rouge', 0.3), ('Bleu', 0.05)]:
        out = eval_soda(pred_path, [gt_path], scorer=scorer)
        assert out['soda_c'] > lo, (scorer, out)


def test_soda_bertscore_requires_local_model(monkeypatch):
    from dvc_tpu.eval.soda import _make_scorer
    monkeypatch.delenv('DVC_BERTSCORE_MODEL', raising=False)
    with pytest.raises(RuntimeError, match='DVC_BERTSCORE_MODEL'):
        _make_scorer('BertScore')
    with pytest.raises(ValueError):
        _make_scorer('NoSuchScorer')


# ---------------------------------------------------------------- SPICE
def test_spice_requires_jar(monkeypatch):
    from dvc_tpu.eval.scorers import Spice
    monkeypatch.delenv('DVC_SPICE_JAR', raising=False)
    with pytest.raises(RuntimeError, match='DVC_SPICE_JAR'):
        Spice().compute_score({0: ['a cat']}, {0: ['a cat']})


def test_spice_jar_protocol(tmp_path, monkeypatch):
    """Exercise the jar-shelling protocol with a java stub: flag order,
    input payload format (reference spice.py:40-75), output parsing incl.
    the None -> NaN conversion (spice.py:26-30, 92-99)."""
    import os
    import stat
    import sys

    stub = tmp_path / 'java_stub.py'
    stub.write_text(f'''#!{sys.executable}
import json, sys
assert sys.argv[1:3] == ['-jar', '-Xmx8G'], sys.argv
jar, in_path = sys.argv[3], sys.argv[4]
assert sys.argv[5] == '-cache' and sys.argv[7] == '-out', sys.argv
assert sys.argv[9:11] == ['-subset', '-silent'], sys.argv
with open(in_path) as f:
    data = json.load(f)
out = []
for rec in data:
    assert set(rec) == {{'image_id', 'test', 'refs'}}, rec
    f1 = 1.0 if rec['test'] in rec['refs'] else 0.25
    out.append({{'image_id': rec['image_id'],
                'scores': {{'All': {{'f': f1, 'p': f1, 'r': f1}},
                           'Object': {{'f': None, 'p': 0.0, 'r': 0.0}}}}}})
with open(sys.argv[8], 'w') as f:
    json.dump(out, f)
''')
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    jar = tmp_path / 'spice-1.0.jar'
    jar.write_bytes(b'fake')
    monkeypatch.setenv('DVC_SPICE_JAR', str(jar))
    monkeypatch.setenv('DVC_SPICE_JAVA', str(stub))
    monkeypatch.setenv('DVC_SPICE_TMP', str(tmp_path / 'work'))

    from dvc_tpu.eval.scorers import Spice
    gts = {'a': ['a cat sits', 'a cat'], 'b': ['a dog runs']}
    res = {'a': ['a cat sits'], 'b': ['a bird flies']}
    mean, scores = Spice().compute_score(gts, res)
    assert mean == pytest.approx((1.0 + 0.25) / 2)
    assert scores[0]['All']['f'] == 1.0
    assert np.isnan(scores[0]['Object']['f'])  # None -> NaN


# ---------------------------------------------------------------- MoverScore
def test_emd_transport():
    from dvc_tpu.eval.soda import emd_transport
    # identical point masses -> zero cost
    cost = np.array([[0.0, 1.0], [1.0, 0.0]])
    a = np.array([0.5, 0.5])
    assert emd_transport(a, a, cost) == pytest.approx(0.0, abs=1e-9)
    # uniform equal-size masses: EMD == assignment cost / n
    rng = np.random.default_rng(0)
    c = rng.uniform(0.1, 2.0, size=(5, 5))
    from scipy.optimize import linear_sum_assignment
    r, col = linear_sum_assignment(c)
    u = np.full(5, 0.2)
    assert emd_transport(u, u, c) == pytest.approx(
        c[r, col].sum() / 5, rel=1e-6)
    # hand case: move 0.25 mass across distance 2
    cost = np.array([[0.0, 2.0]])
    assert emd_transport(np.array([1.0]), np.array([0.75, 0.25]),
                         cost) == pytest.approx(0.5, rel=1e-6)


@pytest.fixture(scope='module')
def tiny_bert_dir(tmp_path_factory):
    """A tiny randomly initialized BERT + wordpiece vocab saved locally, so
    the gated MoverScore/BertScore path runs without network access."""
    torch = pytest.importorskip('torch')
    from transformers import BertConfig, BertModel, BertTokenizer
    d = tmp_path_factory.mktemp('tiny_bert')
    vocab = ['[PAD]', '[UNK]', '[CLS]', '[SEP]', '[MASK]',
             'a', 'cat', 'dog', 'sits', 'runs', 'on', 'the', 'mat',
             'splash', '##ing', 'bird']
    (d / 'vocab.txt').write_text('\n'.join(vocab) + '\n')
    tok = BertTokenizer(str(d / 'vocab.txt'))
    tok.save_pretrained(str(d))
    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=16,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=32, max_position_embeddings=32)
    BertModel(cfg).save_pretrained(str(d))
    return str(d)


def test_moverscore_local_wmd(tiny_bert_dir, monkeypatch):
    from dvc_tpu.eval.soda import MoverScore
    monkeypatch.setenv('DVC_BERTSCORE_MODEL', tiny_bert_dir)
    ms = MoverScore()
    all_gts = {'v1': {'sentences': ['a cat sits on the mat',
                                    'a dog runs']}}
    all_res = {'v1': [{'sentence': 'a cat sits on the mat'},
                      {'sentence': 'a bird splashing'}]}
    ms.make_dict(all_gts, all_res, ['v1'])
    gts = {0: ['a cat sits on the mat'], 1: ['a dog runs']}
    same = {0: ['a cat sits on the mat'], 1: ['a dog runs']}
    diff = {0: ['a bird splashing'], 1: ['a bird splashing']}
    mean_same, per_same = ms.compute_score(gts, same)
    mean_diff, _ = ms.compute_score(gts, diff)
    # identical sentences: WMD 0 -> score exactly 1
    assert per_same[0] == pytest.approx(1.0, abs=1e-6)
    assert mean_same > mean_diff
    assert 0.0 < mean_diff < 1.0


def test_moverscore_requires_model_or_pkg(monkeypatch):
    from dvc_tpu.eval.soda import _make_scorer
    monkeypatch.delenv('DVC_BERTSCORE_MODEL', raising=False)
    with pytest.raises(RuntimeError, match='DVC_BERTSCORE_MODEL'):
        _make_scorer('MoverScore')
