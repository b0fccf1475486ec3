"""Hungarian set matcher — fully on-device (reference ``pdvc/matcher.py``).

Builds the focal-class + L1 + gIoU cost matrix exactly as the reference
(``matcher.py:84-100``) and solves the assignment with the JAX
Jonker-Volgenant solver instead of syncing to the CPU for scipy
(``matcher.py:115-119``).  Static shapes: gt events are padded to G slots
with a validity mask; padded rows get constant cost and are ignored
downstream.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.assignment import many_to_one_assignment, masked_assignment
from ..utils.box_ops import box_cl_to_xy, generalized_box_iou


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    cost_class: float = 1.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    cost_alpha: float = 0.25
    cost_gamma: float = 2.0

    @classmethod
    def from_opt(cls, opt):
        return cls(cost_class=opt.set_cost_class, cost_bbox=opt.set_cost_bbox,
                   cost_giou=opt.set_cost_giou, cost_alpha=opt.cost_alpha,
                   cost_gamma=opt.cost_gamma)


def match_cost_matrix(cfg, pred_logits, pred_boxes, gt_labels, gt_boxes):
    """Per-video cost matrix (B, Nq, G) — reference matcher.py:84-100."""
    alpha, gamma = cfg.cost_alpha, cfg.cost_gamma
    prob = jax.nn.sigmoid(pred_logits)                      # (B, Nq, K)
    neg = (1 - alpha) * (prob ** gamma) * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    # gather per-gt class column: (B, Nq, G)
    lab = gt_labels[:, None, :].astype(jnp.int32)
    cost_class = (jnp.take_along_axis(pos, jnp.broadcast_to(lab, (pred_logits.shape[0], pred_logits.shape[1], lab.shape[-1])), axis=2)
                  - jnp.take_along_axis(neg, jnp.broadcast_to(lab, (pred_logits.shape[0], pred_logits.shape[1], lab.shape[-1])), axis=2))
    cost_bbox = jnp.abs(pred_boxes[:, :, None, :]
                        - gt_boxes[:, None, :, :]).sum(-1)  # L1 cdist
    cost_giou = -generalized_box_iou(box_cl_to_xy(pred_boxes),
                                     box_cl_to_xy(gt_boxes))
    return (cfg.cost_bbox * cost_bbox + cfg.cost_class * cost_class
            + cfg.cost_giou * cost_giou)


def hungarian_match(cfg, pred_logits, pred_boxes, gt_labels, gt_boxes,
                    gt_mask):
    """Match gt events to queries.

    Returns col4row (B, G) int32: the query index assigned to each gt slot
    (meaningless where ``gt_mask`` is False), computed with stop_gradient —
    matching is not differentiated, as in the reference's ``torch.no_grad``.
    """
    C = match_cost_matrix(cfg, pred_logits, pred_boxes, gt_labels, gt_boxes)
    C = jax.lax.stop_gradient(C)
    C_t = jnp.swapaxes(C, 1, 2)                             # (B, G, Nq)
    return jax.vmap(masked_assignment)(C_t, gt_mask)


def hungarian_match_m2o(cfg, pred_logits, pred_boxes, gt_labels, gt_boxes,
                        gt_mask, rate: int = 4):
    """Many-to-one match (reference ``rl_indices``, matcher.py:120-123):
    each gt event is assigned up to ``rate`` distinct queries by solving the
    assignment on the gt-tiled cost matrix (m2o_rate=4 in the reference).

    Returns col4row (B, rate, G) int32.  The reference computes this on
    every forward but only the vestigial ``caption_cost_type='rl'`` path
    would consume it (that path ends in an AssertionError there —
    pdvc.py:424-433); we expose it as an opt-in utility instead of paying
    the extra solve each step.
    """
    C = match_cost_matrix(cfg, pred_logits, pred_boxes, gt_labels, gt_boxes)
    C = jax.lax.stop_gradient(C)
    C_t = jnp.swapaxes(C, 1, 2)                             # (B, G, Nq)
    return jax.vmap(lambda c, m: many_to_one_assignment(c, m, rate))(
        C_t, gt_mask)
