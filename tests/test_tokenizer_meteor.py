"""PTB tokenizer tricky cases + METEOR paraphrase-table stage.

The reference tokenizes through the Stanford CoreNLP jar
(``densevid_eval3/pycocoevalcap/tokenizer/ptbtokenizer.py``); these cases
pin ``ptb_tokenize`` to the jar's documented behavior: clitic splitting,
hyphenated words and decimal/thousands numbers kept whole, PTB punctuation
tokens dropped after splitting.
"""

import os

import pytest

from dvc_tpu.eval import scorers as S


@pytest.mark.parametrize('raw,expected', [
    ("Don't add the salt.", "do n't add the salt"),
    ("It's a stir-fry dish!", "it 's a stir-fry dish"),
    ("I can't believe it", "i ca n't believe it"),
    ("we'll cook; then serve", "we 'll cook then serve"),
    ("I'm ready, you're not", "i 'm ready you 're not"),
    ("they've cooked, he'd eaten", "they 've cooked he 'd eaten"),
    ("Add 3.5 cups of water", "add 3.5 cups of water"),
    ("add 1,000 ml", "add 1,000 ml"),
    ("mix (gently) the dough", "mix gently the dough"),
    ("the cats' toys", "the cats toys"),
    ("heat at 5 o'clock", "heat at 5 o'clock"),
    ('she said "hello" loudly', "she said hello loudly"),
    ("pre-heat the oven to 350", "pre-heat the oven to 350"),
    ("slice the state-of-the-art -- carefully...",
     "slice the state-of-the-art carefully"),
])
def test_ptb_tokenize_cases(raw, expected):
    assert S.ptb_tokenize(raw) == expected


def test_meteor_paraphrase_table_raises_score(tmp_path, monkeypatch):
    """With a paraphrase table, a paraphrased caption scores strictly higher
    than without; captions with no paraphrase overlap are unaffected."""
    table = tmp_path / 'paraphrase-en'
    table.write_text('chop up ||| cut into pieces\n'
                     'saute ||| fry lightly\n')
    gts = {'a': ['cut into pieces the onion'], 'b': ['boil the rice']}
    res = {'a': ['chop up the onion'], 'b': ['boil the rice']}
    base_mean, base = S.meteor_compute_score(gts, res)
    monkeypatch.setenv('DVC_METEOR_PARAPHRASE', str(table))
    par_mean, par = S.meteor_compute_score(gts, res)
    assert par[1] == base[1]                 # no table hit: unchanged
    assert par[0] > base[0]                  # phrase match raised the score
    assert par_mean > base_mean


def test_meteor_paraphrase_phrase_match_tsv(tmp_path, monkeypatch):
    table = tmp_path / 'p.tsv'
    table.write_text('chop up\tcut into pieces\n')
    gts = {'a': ['first cut into pieces the carrot']}
    res = {'a': ['first chop up the carrot']}
    monkeypatch.setenv('DVC_METEOR_PARAPHRASE', str(table))
    with_table, _ = S.meteor_compute_score(gts, res)
    monkeypatch.delenv('DVC_METEOR_PARAPHRASE')
    without, _ = S.meteor_compute_score(gts, res)
    assert with_table > without


def test_meteor_missing_table_falls_back(tmp_path, monkeypatch):
    """A missing table path falls back to the plain matcher stages; a
    perfect single-chunk match scores fMean=1 minus the frag penalty."""
    import math
    monkeypatch.setenv('DVC_METEOR_PARAPHRASE', str(tmp_path / 'absent'))
    gts = {'a': ['stir the pot']}
    res = {'a': ['stir the pot']}
    mean, _ = S.meteor_compute_score(gts, res)
    expected = 1.0 - S._M_GAMMA * math.pow(1.0 / 3.0, S._M_BETA)
    assert mean == pytest.approx(expected)
