"""Criterion unit tests against hand-computed values
(SURVEY.md §4: matcher vs scipy, criterion vs hand-computed)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.models.criterion import (COUNTER_CLASS_RATE, CriterionConfig,
                                      counter_loss, layer_losses,
                                      sigmoid_focal_loss)
from dvc_tpu.models.matcher import MatcherConfig, match_cost_matrix


def sigmoid(x):
    return 1 / (1 + np.exp(-x))


def test_sigmoid_focal_loss_hand():
    # single query, single class
    inputs = jnp.asarray([[[0.5]]])
    targets = jnp.asarray([[[1.0]]])
    alpha, gamma = 0.25, 2.0
    p = sigmoid(0.5)
    ce = -np.log(p)
    want = alpha * ((1 - p) ** gamma) * ce  # mean over 1 query, /1 box
    got = float(sigmoid_focal_loss(inputs, targets, 1.0, alpha, gamma))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_counter_loss_prior_weighting():
    cfg = CriterionConfig(max_eseq_length=3)
    pred = jnp.asarray([[0.0, 0.0, 5.0, 0.0]])
    # gt count 2 -> onehot class 2; rate table downweights class 2 & 3
    loss_right = float(counter_loss(cfg, pred, jnp.asarray([2])))
    pred_wrong = jnp.asarray([[5.0, 0.0, 0.0, 0.0]])
    loss_wrong = float(counter_loss(cfg, pred_wrong, jnp.asarray([2])))
    assert loss_right < loss_wrong


def test_match_cost_matrix_hand():
    cfg = MatcherConfig(cost_class=1, cost_bbox=1, cost_giou=0)
    logits = jnp.asarray([[[10.0], [-10.0]]])     # q0 confident, q1 not
    boxes = jnp.asarray([[[0.5, 0.2], [0.1, 0.1]]])
    gt_boxes = jnp.asarray([[[0.5, 0.2]]])
    gt_labels = jnp.zeros((1, 1), jnp.int32)
    C = np.asarray(match_cost_matrix(cfg, logits, boxes, gt_labels,
                                     gt_boxes))
    # q0: zero box cost, large negative class cost (confident positive)
    assert C[0, 0, 0] < C[0, 1, 0]
    # L1 component of q1 = |0.5-0.1| + |0.2-0.1| = 0.5
    alpha, gamma = 0.25, 2.0
    p1 = sigmoid(-10.0)
    pos_cost = alpha * ((1 - p1) ** gamma) * (-np.log(p1 + 1e-8))
    neg_cost = (1 - alpha) * (p1 ** gamma) * (-np.log(1 - p1 + 1e-8))
    np.testing.assert_allclose(C[0, 1, 0], 0.5 + (pos_cost - neg_cost),
                               rtol=1e-4)


def test_layer_losses_perfect_prediction():
    cfg = CriterionConfig(num_classes=1, max_eseq_length=5)
    gt_boxes = jnp.asarray([[[0.3, 0.2], [0.7, 0.2]]])
    gt_mask = jnp.ones((1, 2), bool)
    gt_labels = jnp.zeros((1, 2), jnp.int32)
    # predictions: 4 queries, two match exactly with confident logits
    pred_boxes = jnp.asarray([[[0.3, 0.2], [0.7, 0.2],
                               [0.1, 0.05], [0.9, 0.05]]])
    pred_logits = jnp.asarray([[[8.0], [8.0], [-8.0], [-8.0]]])
    pred_count = jnp.asarray([[0, 0, 8.0, 0, 0, 0]])  # count=2
    losses, col4row = layer_losses(cfg, pred_logits, pred_count, pred_boxes,
                                   gt_labels, gt_boxes, gt_mask,
                                   num_boxes=2.0)
    idx = np.asarray(col4row)[0]
    assert set(idx.tolist()) == {0, 1}
    assert float(losses['loss_bbox']) < 1e-6
    # exact boxes leave the reference's 1e-5 denominator eps visible:
    # 1 - w/(w+1e-5) per pair (reference box_ops.py:26,47)
    assert float(losses['loss_giou']) < 1e-4
    assert float(losses['loss_ce']) < 0.05
    # matched boxes don't overlap -> self-IoU diagnostic 0
    assert float(losses['loss_self_iou']) == 0.0


def test_counter_rate_table_matches_reference():
    # spot-check the hard-coded prior (reference criterion.py:37-44)
    np.testing.assert_allclose(COUNTER_CLASS_RATE[2], 1.93425917e-01)
    np.testing.assert_allclose(COUNTER_CLASS_RATE[3], 4.12129084e-01)
    assert len(COUNTER_CLASS_RATE) == 28
