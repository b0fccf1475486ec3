"""Evaluation-stack robustness: missing predictions, empty videos."""
import json

import pytest

from dvc_tpu.eval import eval_dvc, eval_soda


@pytest.fixture()
def gt(tmp_path):
    gt = {'v_a': {'duration': 10.0, 'timestamps': [[0, 5]],
                  'sentences': ['add oil']},
          'v_b': {'duration': 10.0, 'timestamps': [[2, 8]],
                  'sentences': ['stir well']}}
    p = tmp_path / 'gt.json'
    with open(p, 'w') as f:
        json.dump(gt, f)
    return str(p)


def test_missing_video_in_predictions(gt, tmp_path):
    pred = {'results': {'v_a': [
        {'timestamp': [0, 5], 'sentence': 'add oil',
         'proposal_score': 1.0, 'sentence_score': -0.1,
         'pred_event_count': 1}]}}
    p = tmp_path / 'pred.json'
    with open(p, 'w') as f:
        json.dump(pred, f)
    scores = eval_dvc(str(p), [gt], verbose=True)
    # v_b contributes zero recall; protocol must not crash
    assert 0 < scores['Recall'][0] <= 0.5 + 1e-9
    out = eval_soda(str(p), [gt])
    assert 0 <= out['soda_c'] <= 1


def test_empty_prediction_list(gt, tmp_path):
    pred = {'results': {'v_a': [], 'v_b': []}}
    p = tmp_path / 'pred.json'
    with open(p, 'w') as f:
        json.dump(pred, f)
    scores = eval_dvc(str(p), [gt], verbose=True)
    assert scores['Recall'][0] == 0.0
    out = eval_soda(str(p), [gt])
    assert out['soda_c'] == 0.0


def test_empty_sentence(gt, tmp_path):
    pred = {'results': {'v_a': [
        {'timestamp': [0, 5], 'sentence': '', 'proposal_score': 1.0,
         'sentence_score': -5.0, 'pred_event_count': 1}],
        'v_b': [
        {'timestamp': [2, 8], 'sentence': '', 'proposal_score': 1.0,
         'sentence_score': -5.0, 'pred_event_count': 1}]}}
    p = tmp_path / 'pred.json'
    with open(p, 'w') as f:
        json.dump(pred, f)
    scores = eval_dvc(str(p), [gt], verbose=True)
    assert scores['METEOR'][0] == 0.0
    assert scores['Recall'][0] == 1.0


def test_2021_protocol_random_garbage(gt, tmp_path):
    """2021 protocol compares unmatched predictions against a random string
    (reference evaluate2021.py:27-30) — scores stay finite and low."""
    import json as _json
    pred = {'results': {'v_a': [
        {'timestamp': [9, 10], 'sentence': 'totally unrelated words',
         'proposal_score': 0.5, 'sentence_score': -2.0,
         'pred_event_count': 1}],
        'v_b': [
        {'timestamp': [0, 1], 'sentence': 'other words',
         'proposal_score': 0.5, 'sentence_score': -2.0,
         'pred_event_count': 1}]}}
    p = tmp_path / 'p.json'
    with open(p, 'w') as f:
        _json.dump(pred, f)
    from dvc_tpu.eval import eval_dvc
    s18 = eval_dvc(str(p), [gt], verbose=True, version='2018')
    s21 = eval_dvc(str(p), [gt], verbose=True, version='2021')
    assert s21['METEOR'][0] < 0.05
    assert s18['METEOR'][0] < 0.05


def test_get_topn(gt, tmp_path):
    import json as _json
    from dvc_tpu.eval.eval_utils import get_topn_from_dvcjson
    pred = {'results': {'v_a': [
        {'timestamp': [0, 5], 'sentence': 'a', 'proposal_score': 0.9},
        {'timestamp': [1, 6], 'sentence': 'b', 'proposal_score': 0.5},
        {'timestamp': [2, 7], 'sentence': 'c', 'proposal_score': 0.7},
    ]}}
    p = tmp_path / 'p.json'
    with open(p, 'w') as f:
        _json.dump(pred, f)
    out = get_topn_from_dvcjson(str(p), str(tmp_path / 'top.json'), top_n=2)
    with open(out) as f:
        d = _json.load(f)
    scores = [e['proposal_score'] for e in d['results']['v_a']]
    assert scores == [0.9, 0.7]
