#!/usr/bin/env python
"""Vocabulary builder CLI (reference ``misc/build_vocab.py``).

    python tools/build_vocab.py --anno data/yc2/captiondata/yc2_train.json \
        data/yc2/captiondata/yc2_val.json --count-thr 2 \
        --out data/yc2/vocabulary_youcook2.json
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvc_tpu.data import build_vocab

if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--anno', nargs='+', required=True)
    p.add_argument('--count-thr', type=int, default=2,
                   help='2 for YouCook2, 4 for ActivityNet')
    p.add_argument('--out', required=True)
    args = p.parse_args()
    vocab = build_vocab(args.anno, args.count_thr, args.out)
    print(f'vocab size: {len(vocab["word_to_ix"])} -> {args.out}')
