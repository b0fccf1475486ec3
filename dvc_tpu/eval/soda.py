"""SODA — Story Oriented Dense video cAptioning evaluation (soda_c).

Reference: ``densevid_eval3/SODA/soda.py`` + ``SODA/dataset.py``.  For each
video, a dynamic-programming assignment (monotonic, LCS-style) maximizes the
sum of IoU × METEOR over (gt, prediction) pairs; precision = score / n_pred,
recall = score / n_gt, and soda_c is the mean F1.  The DP here is iterative
(the reference's recursive ``chased_dp_assignment`` overflows Python's
recursion limit on long videos; same recurrence, bottom-up).
"""

from __future__ import annotations

import json
from collections import defaultdict

import numpy as np

from .dvc_eval import iou_1d, remove_nonascii
from .scorers import Meteor, Cider, tokenize_dict


def chased_dp_assignment(scores: np.ndarray):
    """max Σ scores over monotonic non-crossing pairs
    (reference soda.py:143-181, bottom-up)."""
    M, N = scores.shape
    dp = np.zeros((M, N))
    path = np.zeros((M, N), np.int64)
    for i in range(M):
        for j in range(N):
            cands = [dp[i - 1, j] if i > 0 else -1,
                     dp[i, j - 1] if j > 0 else -1,
                     (dp[i - 1, j - 1] if i > 0 and j > 0 else 0)
                     + scores[i, j]]
            k = int(np.argmax(cands))
            dp[i, j] = cands[k]
            path[i, j] = k
    # traceback
    pairs = []
    i, j = M - 1, N - 1
    while i >= 0 and j >= 0:
        k = path[i, j]
        if k == 2:
            pairs.append((i, j))
            i, j = i - 1, j - 1
        elif k == 0:
            i -= 1
        else:
            j -= 1
    return float(dp[M - 1, N - 1]), pairs[::-1]


class SODAC:
    def __init__(self, preds, gts, gt_vids, scorer='Meteor', verbose=False):
        self.preds = preds
        self.gts = gts
        self.gt_vids = gt_vids
        self.scorer = Meteor() if scorer == 'Meteor' else Cider()
        self.scorer_name = scorer
        self.verbose = verbose

    def calc_iou_matrix(self, preds, golds):
        return np.array([[iou_1d(p, ct) for p in preds['timestamps']]
                         for ct in golds['timestamps']])

    def calc_score_matrix(self, preds, golds):
        # note the reference's argument order (soda.py:66-70): the gold
        # sentence is the *hypothesis* and each prediction the reference —
        # kept verbatim since METEOR is asymmetric
        p_sent, g_sent = preds['sentences'], golds['sentences']
        gts_arg = {i: [p] for i, p in enumerate(p_sent)}
        return np.array([
            self.scorer.compute_score(
                gts_arg, {i: [g] for i in range(len(p_sent))})[1]
            for g in g_sent])

    def evaluate(self):
        p_best, r_best, f_best = [], [], []
        for vid in self.gt_vids:
            _p, _r, _f = [], [], []
            pred = self.preds[vid]
            for gt in self.gts:
                if vid not in gt:
                    continue
                gold = gt[vid]
                if len(pred['sentences']) == 0:
                    _p.append(0.0); _r.append(0.0); _f.append(0.0)
                    continue
                _iou = self.calc_iou_matrix(pred, gold)
                scores = self.calc_score_matrix(pred, gold)
                max_score, _ = chased_dp_assignment(_iou * scores)
                n_g, n_p = _iou.shape
                p = max_score / n_p
                r = max_score / n_g
                _p.append(p)
                _r.append(r)
                _f.append(2 * p * r / (p + r) if p + r > 0 else 0.0)
            if not _f:
                continue
            best = int(np.argmax(_f))
            p_best.append(_p[best])
            r_best.append(_r[best])
            f_best.append(_f[best])
        return [float(np.mean(p_best)) if p_best else 0.0,
                float(np.mean(r_best)) if r_best else 0.0,
                float(np.mean(f_best)) if f_best else 0.0]


def _load_gts(filenames, multi_reference=False):
    """(reference SODA/dataset.py:load_ground_truth)."""
    gt_vids = set()
    gts = []
    for fn in filenames:
        with open(fn) as f:
            g = json.load(f)
        gt_vids.update(g.keys())
        gts.append(g)
    if not multi_reference:
        merged = defaultdict(dict)
        for vid in gt_vids:
            t, s = [], []
            for g in gts:
                if vid not in g:
                    continue
                t += [list(x) for x in g[vid]['timestamps']]
                s += list(g[vid]['sentences'])
            order = sorted(range(len(t)), key=lambda i: t[i][0])
            merged[vid]['timestamps'] = [t[i] for i in order]
            merged[vid]['sentences'] = [s[i] for i in order]
        gts = [dict(merged)]
    return gts, gt_vids


def _preprocess(preds, gts, gt_vids):
    """Tokenize everything once (reference SODA/dataset.py:preprocess)."""
    out_preds = {}
    for vid in gt_vids:
        items = sorted(preds[vid], key=lambda x: x['timestamp'][0])
        sents = tokenize_dict({0: [{'caption': remove_nonascii(
            p['sentence'])} for p in items]})[0]
        out_preds[vid] = {'timestamps': [p['timestamp'] for p in items],
                          'sentences': sents}
    out_gts = []
    for g in gts:
        ng = {}
        for vid in gt_vids:
            if vid not in g:
                continue
            sents = tokenize_dict({0: [{'caption': remove_nonascii(s)}
                                       for s in g[vid]['sentences']]})[0]
            ng[vid] = {'timestamps': g[vid]['timestamps'],
                       'sentences': sents}
        out_gts.append(ng)
    return out_preds, out_gts


def eval_soda(prediction, ref_list, verbose=False):
    """Per-reference soda_c averaged (reference eval_soda.py:45-54)."""
    if isinstance(prediction, str):
        with open(prediction) as f:
            prediction = json.load(f)
    scores = []
    for ref in ref_list:
        gts, gt_vids = _load_gts([ref], multi_reference=False)
        gt_vids = [v for v in gt_vids if v in prediction['results']]
        preds, gts = _preprocess(prediction['results'], gts, gt_vids)
        s = SODAC(preds, gts, gt_vids, verbose=verbose).evaluate()
        scores.append(s)
    avg = np.mean(scores, axis=0)
    return {'soda_c': float(avg[-1])}
