#!/usr/bin/env python
"""METEOR calibration harness: pure-Python scorer vs the meteor-1.5 jar.

The reference's headline metric runs through ``meteor-1.5.jar``
(``densevid_eval3/pycocoevalcap/meteor/meteor.py:12-24``); this repo ships a
pure-Python reimplementation (``dvc_tpu/eval/scorers.py``).  When the jar is
available (it is an external artifact, not shipped), this tool scores the
same corpus through both paths and reports the absolute divergence, so the
Python path's tolerance is a measured number rather than a claim.

    DVC_METEOR_JAR=/path/meteor-1.5.jar \
    [DVC_METEOR_PARAPHRASE=/path/paraphrase-en.gz] \
    [DVC_METEOR_FUNCTION_WORDS=/path/en.words] \
    [DVC_METEOR_WORDNET=/path/wordnet/dict] \
    python tools/calibrate_meteor.py [--corpus captions.json] [-n 200]

Artifact extraction (all live inside the meteor-1.5 release):
``paraphrase-en.gz`` ships next to the jar in ``meteor-1.5/data/``;
the English function-word list is a jar resource:
``unzip -p meteor-1.5.jar function/en.words > en.words``; the synonym
stage reads a standard WordNet ``dict`` directory (the jar's synonymy
module is WordNet-derived).  With all env vars set, the Python scorer
consumes the jar's own data files — any remaining divergence is then
purely the aligner's beam-vs-greedy search.

Corpus format: {"video": {"refs": [...], "hyp": "..."} , ...}; without
--corpus a synthetic cooking-caption corpus is generated.
"""

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvc_tpu.eval import scorers as S  # noqa: E402

WORDS = ('add the mix stir pan oil salt cook cut onion bowl water heat '
         'place pot pepper slice chop fry boil serve plate knife spoon '
         'a on in with and then until of it some sauce pour garlic').split()


def synth_corpus(n, seed=0):
    rng = random.Random(seed)
    gts, res = {}, {}
    for i in range(n):
        base = [rng.choice(WORDS) for _ in range(rng.randint(4, 14))]
        refs = []
        for _ in range(rng.randint(1, 3)):
            r = list(base)
            for _ in range(rng.randint(0, 3)):
                r[rng.randrange(len(r))] = rng.choice(WORDS)
            refs.append(' '.join(r))
        hyp = list(base)
        for _ in range(rng.randint(0, 5)):
            hyp[rng.randrange(len(hyp))] = rng.choice(WORDS)
        gts[f'v{i}'] = refs
        res[f'v{i}'] = [' '.join(hyp)]
    return gts, res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--corpus', default=None)
    ap.add_argument('-n', type=int, default=200)
    args = ap.parse_args()

    jar = os.environ.get('DVC_METEOR_JAR')
    if not jar or not os.path.exists(jar):
        print('DVC_METEOR_JAR is not set / does not exist — nothing to '
              'calibrate against. The pure-Python path is the fallback; '
              'supply the jar to measure its divergence.')
        return 1

    if args.corpus:
        with open(args.corpus) as f:
            data = json.load(f)
        gts = {k: v['refs'] for k, v in data.items()}
        res = {k: [v['hyp']] for k, v in data.items()}
    else:
        gts, res = synth_corpus(args.n)

    jar_mean, jar_scores = S._meteor_jar_compute_score(gts, res, jar)
    os.environ.pop('DVC_METEOR_JAR', None)   # force the Python path
    py_mean, py_scores = S.meteor_compute_score(gts, res)

    diffs = [abs(a - b) for a, b in zip(jar_scores, py_scores)]
    report = {
        'n': len(diffs),
        'jar_mean': round(jar_mean, 6),
        'python_mean': round(py_mean, 6),
        'corpus_mean_abs_divergence': round(abs(jar_mean - py_mean), 6),
        'per_caption_mean_abs_divergence': round(
            sum(diffs) / max(len(diffs), 1), 6),
        'per_caption_max_abs_divergence': round(max(diffs, default=0.0), 6),
        'paraphrase_table': os.environ.get('DVC_METEOR_PARAPHRASE') or None,
        'wordnet_dict': os.environ.get('DVC_METEOR_WORDNET') or None,
        'function_words': os.environ.get('DVC_METEOR_FUNCTION_WORDS') or None,
    }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == '__main__':
    sys.exit(main())
