"""Unit coverage for train_tsp.py driver pieces (meters, CSV parsing)."""
import importlib.util
import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    'train_tsp_units', os.path.join(ROOT, 'train_tsp.py'))
ttsp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ttsp)


def test_head_meters_accuracy_and_masking():
    """Reference semantics (train/train.py:21-30 + common/utils.py:162-178):
    accuracy in percent over labeled samples only, sample-count weighted;
    -1 labels excluded from both numerator and denominator."""
    m = ttsp.HeadMeters(['action-label', 'temporal-region-label'])
    logits0 = np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
    labels0 = np.array([0, 1, -1])       # 2 labeled, both correct
    logits1 = np.array([[0.9, 0.1], [0.9, 0.1], [0.1, 0.9]])
    labels1 = np.array([0, 1, 1])        # 2 of 3 correct
    m.update([logits0, logits1], [labels0, labels1], [0.5, 0.25], 0.75)
    assert m.accuracy(0) == 100.0
    assert abs(m.accuracy(1) - 200 / 3) < 1e-9
    assert abs(m.avg_accuracy() - (100 + 200 / 3) / 2) < 1e-9
    # second batch: head0 has no labels at all
    m.update([logits0, logits1], [np.array([-1, -1, -1]), labels1],
             [0.1, 0.05], 0.15)
    assert m.accuracy(0) == 100.0        # unchanged counts
    line = m.results_line(epoch=3)
    assert 'Valid Epoch 3' in line and 'Avg Accuracy' in line
    assert '<action-label> Accuracy 100.000' in line
    # single-process sync is the identity
    before = (m.correct.copy(), m.counts.copy(), m.loss_sums.copy())
    m.sync()
    np.testing.assert_array_equal(m.correct, before[0])
    np.testing.assert_array_equal(m.counts, before[1])
    np.testing.assert_allclose(m.loss_sums, before[2])


def test_load_label_mappings(tmp_path):
    import json
    p = tmp_path / 'map.json'
    with open(p, 'w') as f:
        json.dump(['grilled cheese', 'pizza'], f)
    maps = ttsp.load_label_mappings([str(p)])
    assert maps == [{'grilled cheese': 0, 'pizza': 1}]
