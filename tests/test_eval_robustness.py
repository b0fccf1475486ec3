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
