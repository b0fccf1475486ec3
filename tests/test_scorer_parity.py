"""Parity of dvc_tpu's pure-Python scorers against the reference's vendored
pycocoevalcap Python implementations (densevid_eval3/pycocoevalcap/{bleu,
cider,rouge}) — importable offline, read-only.

These pin the exact metric formulas on identical tokenized input (the
reference applies these scorers to pre-tokenized caption strings); a
mismatch here means model-best selection and reported benchmark scores are
denominated in a different currency than the reference's.
"""

import os
import random
import sys

import numpy as np
import pytest

REF = '/root/reference/densevid_eval3'
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, 'pycocoevalcap')),
    reason='reference pycocoevalcap not available')

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from dvc_tpu.eval import scorers as S

WORDS = ('add the mix stir pan oil salt cook cut onion bowl water heat '
         'place pot pepper slice chop fry boil serve plate knife spoon '
         'a on in with and then until of it some').split()


def _synth_corpus(n_items=200, seed=0):
    """Synthetic caption corpus: overlapping hyp/ref vocab, variable length,
    multiple references, some exact matches and some disjoint pairs."""
    rng = random.Random(seed)
    gts, res = {}, {}
    for i in range(n_items):
        key = f'v{i}'
        n_refs = rng.randint(1, 3)
        base = [rng.choice(WORDS) for _ in range(rng.randint(3, 14))]
        refs = []
        for _ in range(n_refs):
            ref = list(base)
            for _ in range(rng.randint(0, 3)):
                ref[rng.randrange(len(ref))] = rng.choice(WORDS)
            refs.append(' '.join(ref))
        if i % 7 == 0:
            hyp = refs[0]                       # exact match
        elif i % 11 == 0:
            hyp = ' '.join(rng.choice(WORDS) for _ in range(5))  # disjoint
        else:
            hyp = list(base)
            for _ in range(rng.randint(0, 4)):
                hyp[rng.randrange(len(hyp))] = rng.choice(WORDS)
            hyp = ' '.join(hyp)
        gts[key] = refs
        res[key] = [hyp]
    return gts, res


@pytest.fixture(scope='module')
def corpus():
    return _synth_corpus()


def test_bleu_parity(corpus):
    from pycocoevalcap.bleu.bleu import Bleu as RefBleu
    gts, res = corpus
    ref_score, ref_scores = RefBleu(4).compute_score(gts, res, verbose=0)
    score, scores = S.Bleu(4).compute_score(gts, res)
    np.testing.assert_allclose(score, ref_score, atol=1e-9)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               atol=1e-9)


def test_cider_parity(corpus):
    from pycocoevalcap.cider.cider import Cider as RefCider
    gts, res = corpus
    ref_score, ref_scores = RefCider().compute_score(gts, res)
    score, scores = S.Cider().compute_score(gts, res)
    np.testing.assert_allclose(score, ref_score, atol=1e-9)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               atol=1e-9)


def test_rouge_parity(corpus):
    from pycocoevalcap.rouge.rouge import Rouge as RefRouge
    gts, res = corpus
    ref_score, ref_scores = RefRouge().compute_score(gts, res)
    score, scores = S.Rouge().compute_score(gts, res)
    np.testing.assert_allclose(score, ref_score, atol=1e-9)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               atol=1e-9)


def test_bleu_parity_edge_cases():
    """Short captions exercise the small-length smoothing/clipping branches."""
    from pycocoevalcap.bleu.bleu import Bleu as RefBleu
    gts = {'a': ['one'], 'b': ['two words here'], 'c': ['the the the the'],
           'd': ['exact match caption'], 'e': ['completely different text']}
    res = {'a': ['one'], 'b': ['two words'], 'c': ['the the'],
           'd': ['exact match caption'], 'e': ['nothing in common at all']}
    ref_score, _ = RefBleu(4).compute_score(gts, res, verbose=0)
    score, _ = S.Bleu(4).compute_score(gts, res)
    np.testing.assert_allclose(score, ref_score, atol=1e-9)
