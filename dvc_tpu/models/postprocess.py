"""Post-processing of PDVC outputs into per-video event lists.

Reference: ``pdvc/pdvc.py:493-546`` (PostProcess).  Per video: sigmoid the
class logits, take the top-Nq (query, class) pairs, convert boxes to
(start, end), clamp to [0, 1], scale by the video duration, decode captions
and score them by the sum of masked token logprobs, and read the predicted
event count from the counter head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.box_ops import box_cl_to_xy


def postprocess(out, target_sizes):
    """Device-side part (jit-friendly).

    out: model eval outputs (last layer); target_sizes: (B,) durations.
    Returns dict of arrays, all (B, Nq, ...), sorted by score desc.
    """
    logits = out['pred_logits']
    B, Nq, K = logits.shape
    prob = jax.nn.sigmoid(logits).reshape(B, Nq * K)
    scores, topk_idx = jax.lax.top_k(prob, Nq)
    topk_boxes = topk_idx // K
    labels = topk_idx % K

    boxes = box_cl_to_xy(out['pred_boxes'])
    boxes = jnp.clip(boxes, 0.0, 1.0)
    boxes = jnp.take_along_axis(boxes, topk_boxes[..., None], axis=1)
    boxes = boxes * target_sizes[:, None, None]

    result = {'scores': scores, 'labels': labels, 'boxes': boxes,
              'query_id': topk_boxes,
              'pred_count': jnp.clip(jnp.argmax(out['pred_count'], -1), 1,
                                     None)}
    if 'seq' in out:
        seq = out['seq']                               # (B, Nq, Lmax)
        mask = (seq > 0).astype(jnp.float32)
        cap_scores = (mask * out['cap_prob_eval']).sum(-1)
        result['seq'] = jnp.take_along_axis(seq, topk_boxes[..., None],
                                            axis=1)
        result['caption_scores'] = jnp.take_along_axis(cap_scores,
                                                       topk_boxes, axis=1)
    return result


def to_dvc_records(post, video_keys, durations, translator):
    """Host-side: convert one batch of postprocessed arrays into dvc-json
    records (reference ``eval_utils.py:192-208``)."""
    import numpy as np
    results = {}
    scores = np.asarray(post['scores'])
    boxes = np.asarray(post['boxes'])
    qids = np.asarray(post['query_id'])
    counts = np.asarray(post['pred_count'])
    seq = np.asarray(post['seq']) if 'seq' in post else None
    cap_scores = (np.asarray(post['caption_scores'])
                  if 'caption_scores' in post else None)
    for b, vid in enumerate(video_keys):
        items = []
        for q in range(scores.shape[1]):
            sentence = (translator.rtranslate(seq[b, q])
                        if seq is not None else '')
            items.append({
                'timestamp': [float(boxes[b, q, 0]), float(boxes[b, q, 1])],
                # the reference writes "raw_box" per record
                # (eval_utils.py:195) but its PostProcess assigns the
                # clamped/gathered boxes to the 'raw_boxes' field
                # (pdvc.py:543 zips `b` in, not `rb`), so raw_box ==
                # timestamp; reproduced for record-format parity
                'raw_box': [float(boxes[b, q, 0]), float(boxes[b, q, 1])],
                'proposal_score': float(scores[b, q]),
                'sentence': sentence,
                'sentence_score': (float(cap_scores[b, q])
                                   if cap_scores is not None else -1e5),
                'query_id': int(qids[b, q]),
                'vid_duration': float(durations[b]),
                'pred_event_count': int(counts[b]),
            })
        results[vid] = items
    return results
