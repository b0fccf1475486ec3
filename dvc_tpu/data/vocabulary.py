"""Vocabulary / Translator (reference ``data/video_dataset.py:152-180`` and
``misc/build_vocab.py``).

Token ids: 0 is BOS/EOS, 1..vocab_size-? are words, ``vocab_size`` is UNK.
The vocab JSON format is the reference's: {'ix_to_word': {id: word},
'word_to_ix': {word: id}} so released vocab files load unchanged.
"""

from __future__ import annotations

import json
from collections import defaultdict

import numpy as np

_STRIP_TOKENS = [',', ':', '!', '_', ';', '-', '.', '?', '/', '"', '\\n', '\\', '.']


class Translator:
    def __init__(self, translator_json: str, vocab_size: int):
        self.vocab_size = vocab_size
        with open(translator_json, 'r') as f:
            vocab = json.load(f)
        assert vocab_size == len(vocab['word_to_ix'].keys())
        self.word_to_ix = defaultdict(lambda: self.vocab_size,
                                      vocab['word_to_ix'])
        self.ix_to_word = defaultdict(lambda: self.vocab_size,
                                      vocab['ix_to_word'])

    def translate(self, sentence: str, max_len: int) -> np.ndarray:
        """Sentence -> [BOS=0, ids..., EOS=0], truncated to max_len."""
        for tok in _STRIP_TOKENS:
            sentence = sentence.replace(tok, ' ')
        words = sentence.replace('.', ' . ').replace(',', ' , ').lower().split()
        ids = [self.word_to_ix[w] for w in words][:max_len - 2]
        return np.array([0] + ids + [0], dtype=np.int64)

    def rtranslate(self, sent_ids) -> str:
        """Ids -> sentence, truncated at the first 0 (EOS)."""
        sent_ids = list(sent_ids)
        for i, t in enumerate(sent_ids):
            if t == 0:
                sent_ids = sent_ids[:i]
                break
        if len(sent_ids):
            return ' '.join(self.ix_to_word[str(int(i))]
                            for i in sent_ids) + '.'
        return ''


def build_vocab(anno_files, count_thr: int, out_path: str | None = None):
    """Count-threshold vocab builder (reference ``misc/build_vocab.py:1-65``).

    anno_files: list of caption-annotation JSONs ({vid: {'sentences': [...]}}).
    Returns the vocab dict; writes it to ``out_path`` if given.
    """
    counts: dict[str, int] = {}
    for path in anno_files:
        with open(path) as f:
            anno = json.load(f)
        for vid in anno.values():
            for sent in vid.get('sentences', []):
                for tok in _STRIP_TOKENS:
                    sent = sent.replace(tok, ' ')
                for w in sent.lower().split():
                    counts[w] = counts.get(w, 0) + 1
    # reference keeps <bos>/<eos> sentinels and an explicit UNK entry, with
    # word ids starting at 1 and threshold inclusive (build_vocab.py:47-59)
    counts['<bos>'] = int(1e10)
    counts['<eos>'] = int(1e10)
    words = [w for w, n in counts.items() if n >= count_thr]
    words.append('UNK')
    ix_to_word = {str(i + 1): w for i, w in enumerate(words)}
    word_to_ix = {w: i + 1 for i, w in enumerate(words)}
    vocab = {'ix_to_word': ix_to_word, 'word_to_ix': word_to_ix}
    if out_path:
        with open(out_path, 'w') as f:
            json.dump(vocab, f)
    return vocab
