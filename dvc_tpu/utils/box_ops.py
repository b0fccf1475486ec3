"""1-D temporal box utilities (reference ``misc/detr_utils/box_ops.py:8-48``).

Boxes live on a normalized [0, 1] timeline in two parametrizations:
(center, length) and (start, end).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cl_to_xy(x):
    """(center, length) -> (start, end)."""
    c, l = x[..., 0], x[..., 1]
    return jnp.stack([c - 0.5 * l, c + 0.5 * l], axis=-1)


def box_xy_to_cl(x):
    """(start, end) -> (center, length)."""
    s, e = x[..., 0], x[..., 1]
    return jnp.stack([(s + e) / 2, e - s], axis=-1)


def box_length(boxes):
    return boxes[..., 1] - boxes[..., 0]


def box_iou(boxes1, boxes2):
    """Pairwise IoU of (start, end) boxes: (..., N, 2) x (..., M, 2) -> (..., N, M).

    Also returns the union, matching the reference helper's signature.
    """
    area1 = box_length(boxes1)
    area2 = box_length(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, 0], boxes2[..., None, :, 0])
    rb = jnp.minimum(boxes1[..., :, None, 1], boxes2[..., None, :, 1])
    inter = jnp.clip(rb - lt, 0, None)
    union = area1[..., :, None] + area2[..., None, :] - inter
    # eps must match the reference's 1e-5 (box_ops.py:26): with gt
    # proposals the boxes coincide exactly and the eps shows up in the
    # reported loss_giou
    iou = inter / (union + 1e-5)
    return iou, union


def generalized_box_iou(boxes1, boxes2):
    """1-D gIoU (reference box_ops.py:34-48): IoU - (hull - union) / hull."""
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, 0], boxes2[..., None, :, 0])
    rb = jnp.maximum(boxes1[..., :, None, 1], boxes2[..., None, :, 1])
    hull = jnp.clip(rb - lt, 0, None)
    return iou - (hull - union) / (hull + 1e-5)


def inverse_sigmoid(x, eps: float = 1e-5):
    """Numerically clamped logit (reference ``misc/detr_utils/misc.py:540-544``)."""
    x = jnp.clip(x, 0, 1)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)
