"""Set-prediction criterion (reference ``pdvc/criterion.py``).

Losses per decoder layer: sigmoid focal classification, Gaussian-masked
event-count cross-entropy with a class-rate prior, L1 + gIoU box losses,
plus log-only cardinality error and self-IoU diagnostics.  Everything is
static-shape and masked; matching comes from ``matcher.hungarian_match``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.box_ops import box_cl_to_xy, box_iou, generalized_box_iou
from .matcher import MatcherConfig, hungarian_match

# Empirical event-count prior (reference criterion.py:37-44, hard-coded).
COUNTER_CLASS_RATE = np.array([
    0.00000000e+00, 0.00000000e+00, 1.93425917e-01, 4.12129084e-01,
    1.88929963e-01, 7.81296833e-02, 5.09541413e-02, 3.12718553e-02,
    1.84833650e-02, 8.39244680e-03, 6.59406534e-03, 4.49595364e-03,
    2.19802178e-03, 1.79838146e-03, 5.99460486e-04, 4.99550405e-04,
    4.99550405e-04, 1.99820162e-04, 2.99730243e-04, 3.99640324e-04,
    2.99730243e-04, 0.00000000e+00, 1.99820162e-04, 0.00000000e+00,
    0.00000000e+00, 0.00000000e+00, 9.99100809e-05, 9.99100809e-05],
    dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class CriterionConfig:
    num_classes: int = 1
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    lloss_gau_mask: int = 1
    lloss_beta: float = 1.0
    max_eseq_length: int = 10
    matcher: MatcherConfig = dataclasses.field(default_factory=MatcherConfig)

    @classmethod
    def from_opt(cls, opt):
        return cls(num_classes=opt.num_classes, focal_alpha=opt.focal_alpha,
                   focal_gamma=opt.focal_gamma,
                   lloss_gau_mask=opt.lloss_gau_mask,
                   lloss_beta=opt.lloss_beta,
                   max_eseq_length=opt.max_eseq_length,
                   matcher=MatcherConfig.from_opt(opt))


def _bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(inputs, targets, num_boxes, alpha, gamma):
    """Reference criterion.py:222-248 (mean over queries, / num_boxes)."""
    prob = jax.nn.sigmoid(inputs)
    ce = _bce_with_logits(inputs, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss.mean(axis=1).sum() / num_boxes


def counter_loss(cfg, pred_count, gt_count):
    """Gaussian-masked BCE over the event-count logits
    (reference criterion.py:200-220 + loss_labels:67-76)."""
    E1 = pred_count.shape[1]                   # max_eseq_length + 1
    max_length = E1 - 1
    tgt = jnp.clip(gt_count, 0, max_length).astype(jnp.int32)
    onehot = jax.nn.one_hot(tgt, E1)
    rate = np.zeros((E1,), np.float32)
    n = min(E1, len(COUNTER_CLASS_RATE))
    rate[:n] = COUNTER_CLASS_RATE[:n]
    weight = 1.0 - jnp.asarray(rate)

    loss = _bce_with_logits(pred_count, onehot) * weight
    if cfg.lloss_gau_mask:
        mu = jnp.arange(E1, dtype=jnp.float32)
        gauss = jnp.exp(-(mu[:, None] - mu[None, :]) ** 2 / (2 * 2.0 ** 2))
        mask = gauss[tgt]                       # (B, E1)
        coef = onehot + ((1 - mask) ** cfg.lloss_beta) * (1 - onehot)
    else:
        coef = jnp.ones_like(onehot)
    return (loss * coef).mean(axis=1).mean()


def layer_losses(cfg: CriterionConfig, pred_logits, pred_count, pred_boxes,
                 gt_labels, gt_boxes, gt_mask, num_boxes, col4row=None):
    """Losses for a single decoder layer's outputs.

    Returns (loss_dict, col4row) with col4row (B, G) the matched query per
    gt slot; pass a precomputed ``col4row`` to skip matching (used by the
    layer-batched criterion).
    """
    B, Nq, K = pred_logits.shape
    if col4row is None:
        col4row = hungarian_match(cfg.matcher, pred_logits, pred_boxes,
                                  gt_labels, gt_boxes, gt_mask)

    # --- classification: scatter matched gt labels onto queries ----------
    # target_classes_onehot (B, Nq, K): 1 at (matched query, its label)
    q_onehot = jax.nn.one_hot(col4row, Nq) * gt_mask[..., None]   # (B,G,Nq)
    l_onehot = jax.nn.one_hot(gt_labels, K)                        # (B,G,K)
    target_onehot = jnp.einsum('bgq,bgk->bqk', q_onehot, l_onehot)
    target_onehot = jnp.clip(target_onehot, 0, 1)
    loss_ce = sigmoid_focal_loss(pred_logits, target_onehot, num_boxes,
                                 cfg.focal_alpha, cfg.focal_gamma) * Nq

    # --- counter ---------------------------------------------------------
    gt_count = gt_mask.sum(-1)
    loss_counter = counter_loss(cfg, pred_count, gt_count)

    # --- boxes (matched pairs) ------------------------------------------
    src_boxes = jnp.take_along_axis(
        pred_boxes, col4row[..., None], axis=1)                    # (B,G,2)
    m = gt_mask.astype(jnp.float32)
    loss_bbox = (jnp.abs(src_boxes - gt_boxes).sum(-1) * m).sum() / num_boxes
    giou = generalized_box_iou(box_cl_to_xy(src_boxes),
                               box_cl_to_xy(gt_boxes))
    giou_diag = jnp.diagonal(giou, axis1=1, axis2=2)               # (B,G)
    loss_giou = ((1 - giou_diag) * m).sum() / num_boxes

    # --- self-IoU diagnostic (log-only; reference criterion.py:114-121) --
    iou_mat, _ = box_iou(box_cl_to_xy(src_boxes), box_cl_to_xy(src_boxes))
    pair = m[:, :, None] * m[:, None, :]
    triu = jnp.triu(jnp.ones_like(iou_mat), k=1)
    n_valid = m.sum(-1)
    denom = 0.5 * n_valid * (n_valid - 1)
    per_video = (iou_mat * pair * triu).sum((1, 2)) / jnp.maximum(denom, 1.0)
    loss_self_iou = jnp.where(denom > 0, per_video, 0.0).sum()

    # --- cardinality (log-only; reference criterion.py:80-92) ------------
    card_pred = (jnp.argmax(pred_logits, -1) != K - 1).sum(-1)
    card_err = jnp.abs(card_pred.astype(jnp.float32)
                       - gt_count.astype(jnp.float32)).mean()

    losses = {'loss_ce': loss_ce, 'loss_counter': loss_counter,
              'loss_bbox': loss_bbox, 'loss_giou': loss_giou,
              'loss_self_iou': loss_self_iou, 'cardinality_error': card_err}
    return losses, col4row


def criterion_forward(cfg: CriterionConfig, outputs, gt_labels, gt_boxes,
                      gt_mask, aux_loss=True):
    """Full criterion over last + aux decoder layers.

    outputs: dict with 'pred_logits' (D,B,Nq,K), 'pred_count' (D,B,E+1),
    'pred_boxes' (D,B,Nq,2) stacked over decoder layers (last layer last).
    Returns (losses, last_indices, aux_indices) — aux losses carry the
    reference's ``_{i}`` suffixes.
    """
    D = outputs['pred_logits'].shape[0]
    num_boxes = jnp.maximum(gt_mask.sum().astype(jnp.float32), 1.0)

    # one vmapped assignment solve over (layers x batch): the Dijkstra
    # while-loop runs until every lane converges, so batching the lanes
    # beats D sequential solves
    layer_ids = list(range(D)) if aux_loss else [D - 1]
    stacked = jax.vmap(
        lambda lg, bx: hungarian_match(cfg.matcher, lg, bx, gt_labels,
                                       gt_boxes, gt_mask))(
        outputs['pred_logits'][jnp.asarray(layer_ids)],
        outputs['pred_boxes'][jnp.asarray(layer_ids)])   # (D', B, G)

    losses, last_idx = layer_losses(
        cfg, outputs['pred_logits'][-1], outputs['pred_count'][-1],
        outputs['pred_boxes'][-1], gt_labels, gt_boxes, gt_mask, num_boxes,
        col4row=stacked[-1])
    aux_idx = []
    if aux_loss:
        for i in range(D - 1):
            l_dict, idx = layer_losses(
                cfg, outputs['pred_logits'][i], outputs['pred_count'][i],
                outputs['pred_boxes'][i], gt_labels, gt_boxes, gt_mask,
                num_boxes, col4row=stacked[i])
            aux_idx.append(idx)
            losses.update({f'{k}_{i}': v for k, v in l_dict.items()})
    return losses, last_idx, aux_idx


def build_weight_dict(opt):
    """Loss-weight table incl. aux suffixes (reference pdvc.py:583-595)."""
    weight_dict = {'loss_ce': opt.cls_loss_coef,
                   'loss_bbox': opt.bbox_loss_coef,
                   'loss_giou': opt.giou_loss_coef,
                   'loss_counter': opt.count_loss_coef,
                   'loss_caption': opt.caption_loss_coef}
    if opt.aux_loss:
        aux = {}
        for i in range(opt.dec_layers - 1):
            aux.update({f'{k}_{i}': v for k, v in weight_dict.items()})
        weight_dict.update(aux)
    if opt.transformer_input_type == 'gt_proposals':
        # two-stage on gt proposals: localization losses are disabled
        # (reference decide_two_stage, misc/utils.py:31-49)
        for q_k in ('loss_length', 'loss_ce', 'loss_bbox', 'loss_giou'):
            for key in list(weight_dict):
                if q_k in key:
                    weight_dict[key] = 0
    return weight_dict
