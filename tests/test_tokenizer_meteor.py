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


# ---------------------------------------------------------------------------
# Golden suite, group A: cases where ptb_tokenize MUST match the CoreNLP
# PTBTokenizer pipeline (jar -preserveLines -lowerCase + the reference's
# PUNCTUATIONS post-filter, ptbtokenizer.py:21-22,64-65).  Expected strings
# follow the documented PTB tokenization rules (clitic splitting incl. the
# ca/wo/sha n't stems, hyphenated compounds kept whole, decimal/thousands
# numbers kept whole, symbol separation, punctuation dropped by the
# post-filter).
# ---------------------------------------------------------------------------
@pytest.mark.parametrize('raw,expected', [
    # clitics
    ("Don't add the salt.", "do n't add the salt"),
    ("It's a stir-fry dish!", "it 's a stir-fry dish"),
    ("I can't believe it", "i ca n't believe it"),
    ("you won't need more", "you wo n't need more"),
    ("we shan't bother", "we sha n't bother"),
    ("we'll cook; then serve", "we 'll cook then serve"),
    ("I'm ready, you're not", "i 'm ready you 're not"),
    ("they've cooked, he'd eaten", "they 've cooked he 'd eaten"),
    ("that's how she's done it", "that 's how she 's done it"),
    ("the chef's knife", "the chef 's knife"),
    ("DOESN'T MATTER", "does n't matter"),
    # possessive-plural apostrophe becomes a bare ' and is filtered
    ("the cats' toys", "the cats toys"),
    ("heat at 5 o'clock", "heat at 5 o'clock"),
    # numbers
    ("Add 3.5 cups of water", "add 3.5 cups of water"),
    ("add 1,000 ml", "add 1,000 ml"),
    ("bake for 5-6 minutes", "bake for 5-6 minutes"),
    ("heat to 350 degrees", "heat to 350 degrees"),
    # symbols kept as their own tokens (not in the PUNCTUATIONS filter)
    ("mix 50% flour", "mix 50 % flour"),
    ("it costs $5", "it costs $ 5"),
    ("salt & pepper", "salt & pepper"),
    ("use salt + sugar", "use salt + sugar"),
    ("rate it 5*", "rate it 5 *"),
    ("a=b here", "a = b here"),
    # digit-attached possessive splits like the letter case
    ("the 80's music", "the 80 's music"),
    ("the dish's 5's rating", "the dish 's 5 's rating"),
    # hyphenated compounds stay whole
    ("pre-heat the oven to 350", "pre-heat the oven to 350"),
    ("a twenty-one year-old recipe", "a twenty-one year-old recipe"),
    ("slice the state-of-the-art -- carefully...",
     "slice the state-of-the-art carefully"),
    # sentence punctuation dropped by the post-filter
    ("boil, then simmer: done.", "boil then simmer done"),
    ("really?! yes.", "really yes"),
    ("wait ... now", "wait now"),
    # quotes normalize to ``/'' (symbols unaffected by -lowerCase) and are
    # filtered
    ('she said "hello" loudly', "she said hello loudly"),
    ("add the 'secret' sauce", "add the secret sauce"),
    # whitespace / empty
    ("   spaced    out   ", "spaced out"),
    ("", ""),
    ("...", ""),
])
def test_ptb_tokenize_matches_corenlp(raw, expected):
    assert S.ptb_tokenize(raw) == expected


# ---------------------------------------------------------------------------
# Golden suite, group B: ENUMERATED divergences from the CoreNLP jar
# pipeline.  Each entry pins our current output AND records what the jar
# pipeline would produce, so the approximation's gaps are a closed list
# rather than unknowns (none of these token shapes appears in
# model-generated captions drawn from the YC2/ANet vocabularies, which is
# why they are tolerated; DVC_PTB_JAR switches to the jar when exactness
# matters).
# ---------------------------------------------------------------------------
@pytest.mark.parametrize('raw,ours,corenlp', [
    # abbreviation periods stay attached in CoreNLP, we split+drop them
    ("mr. smith cooks", "mr smith cooks", "mr. smith cooks"),
    ("preheat, etc. as usual", "preheat etc as usual",
     "preheat etc. as usual"),
    ("u.s. style bbq", "u s style bbq", "u.s. style bbq"),
    ("serve at 9 a.m. sharp", "serve at 9 a m sharp",
     "serve at 9 a.m. sharp"),
    # PTB contraction rewrites we don't apply
    ("you cannot stir", "you cannot stir", "you can not stir"),
    ("gonna cook now", "gonna cook now", "gon na cook now"),
    ("wanna taste it", "wanna taste it", "wan na taste it"),
    # colon-joined times / slash fractions: CoreNLP keeps one token
    ("cook until 1:30", "cook until 1 30", "cook until 1:30"),
    ("add 2 1/2 cups", "add 2 1 / 2 cups", "add 2 1/2 cups"),
    # non-ASCII letters: CoreNLP keeps the word whole
    ("café au lait", "caf é au lait", "café au lait"),
    # brackets: CoreNLP -lowerCase emits -lrb-/-rrb- which the reference's
    # case-sensitive PUNCTUATIONS filter does NOT drop; we drop the
    # brackets entirely (deliberate: no -lrb- noise tokens in captions)
    ("mix (gently) the dough", "mix gently the dough",
     "mix -lrb- gently -rrb- the dough"),
])
def test_ptb_tokenize_known_divergences(raw, ours, corenlp):
    got = S.ptb_tokenize(raw)
    assert got == ours, f'pinned approximation changed for {raw!r}'
    assert got != corenlp  # else: move the case to the parity group


def test_ptb_jar_postfilter_and_dispatch(tmp_path, monkeypatch):
    """DVC_PTB_JAR mode: the reference's PUNCTUATIONS post-filter applies
    to the jar's token stream verbatim (ptbtokenizer.py:64-65), and
    tokenize_dict falls back to the python tokenizer with a note when the
    jar invocation fails (no java on this box)."""
    lines = ["do n't add the salt .",
             "it 's a -LRB- small -RRB- dish ...",
             "plain"]
    assert S._ptb_filter_jar_lines(lines) == [
        "do n't add the salt", "it 's a small dish", "plain"]
    # dispatch: a jar path that exists but cannot run -> python fallback
    fake = tmp_path / 'stanford-corenlp-3.4.1.jar'
    fake.write_bytes(b'not a jar')
    monkeypatch.setenv('DVC_PTB_JAR', str(fake))
    out = S.tokenize_dict({'v1': [{'caption': "Don't stop."}]})
    assert out == {'v1': ["do n't stop"]}
    monkeypatch.delenv('DVC_PTB_JAR')
    out2 = S.tokenize_dict({'v1': [{'caption': "Don't stop."}]})
    assert out2 == out


def test_ptb_jar_mode_preserves_empty_caption_keys(tmp_path, monkeypatch):
    """Videos with zero predicted events must keep their [] entry in jar
    mode (SODA indexes preds[vid] unconditionally)."""
    fake = tmp_path / 'stanford-corenlp-3.4.1.jar'
    fake.write_bytes(b'x')
    monkeypatch.setenv('DVC_PTB_JAR', str(fake))
    monkeypatch.setattr(S, '_ptb_jar_tokenize',
                        lambda caps, jar: [c.lower() for c in caps])
    out = S.tokenize_dict({'v_empty': [],
                           'v_one': [{'caption': 'Stir THE pot'}]})
    assert out == {'v_empty': [], 'v_one': ['stir the pot']}


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


def test_meteor_paraphrase_table_weighted_gz_format(tmp_path, monkeypatch):
    """The real meteor-1.5 ``paraphrase-en.gz`` format: gzipped, weighted
    phrase pairs — a numeric probability field may lead or trail the two
    phrases, ``|||`` or tab separated.  Dropping the artifact in requires
    zero code changes (the entry weight itself is unused: the jar scores
    every paraphrase match with the fixed 'en' matcher weight 0.6)."""
    import gzip
    table = tmp_path / 'paraphrase-en.gz'
    with gzip.open(table, 'wt', encoding='utf-8') as f:
        f.write('0.4217 ||| chop up ||| cut into pieces\n'    # leading w
                'saute\tfry lightly\t0.125\n'                 # trailing w
                '0.33 ||| same ||| same\n'                    # identity: out
                'junk-line-without-separator\n'
                '0.9\n')                                      # malformed
    tab = S.load_paraphrase_table(str(table))
    assert tab['chop up'] == {'cut into pieces'}
    assert tab['cut into pieces'] == {'chop up'}              # symmetric
    assert tab['saute'] == {'fry lightly'}
    assert 'same' not in tab
    assert '0.9' not in tab and 'junk-line-without-separator' not in tab

    monkeypatch.setenv('DVC_METEOR_PARAPHRASE', str(table))
    with_t, _ = S.meteor_compute_score({'a': ['cut into pieces the onion']},
                                       {'a': ['chop up the onion']})
    monkeypatch.delenv('DVC_METEOR_PARAPHRASE')
    without, _ = S.meteor_compute_score({'a': ['cut into pieces the onion']},
                                        {'a': ['chop up the onion']})
    assert with_t > without


def test_meteor_function_word_file_override(tmp_path, monkeypatch):
    """``DVC_METEOR_FUNCTION_WORDS`` points at the jar's ``function/en.words``
    resource (one word per line, # comments); delta-weighting follows it."""
    fw = tmp_path / 'en.words'
    fw.write_text('# function words\nthe\nof\nSTIR\n')
    assert S.load_function_words(str(fw)) == {'the', 'of', 'stir'}

    gts = {'a': ['stir the pot']}
    res = {'a': ['stir the lid']}
    base, _ = S.meteor_compute_score(gts, res)
    monkeypatch.setenv('DVC_METEOR_FUNCTION_WORDS', str(fw))
    over, _ = S.meteor_compute_score(gts, res)
    monkeypatch.delenv('DVC_METEOR_FUNCTION_WORDS')
    # 'stir' reclassified as a function word changes the delta weighting
    assert over != base


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


def _write_wordnet_dict(tmp_path):
    """Minimal WordNet ``dict`` directory: real index-file field layout
    (lemma pos synset_cnt p_cnt ptr... sense_cnt tagsense_cnt offsets)."""
    d = tmp_path / 'dict'
    d.mkdir()
    (d / 'index.noun').write_text(
        '  1 license header line\n'
        'pot n 2 1 @ 2 1 03990474 02863750\n'
        'saucepan n 1 1 @ 1 0 04116098\n'
        'kettle n 1 1 @ 1 0 03990474\n'
        'a_posteriori n 1 0 1 0 99999999\n')
    (d / 'index.verb').write_text(
        'cook v 1 2 @ ~ 1 1 00243900\n'
        'prepare v 1 2 @ ~ 1 1 00243900\n')
    return d


def test_wordnet_synset_loader(tmp_path):
    table = S.load_wordnet_synsets(str(_write_wordnet_dict(tmp_path)))
    assert table['pot'] == frozenset({'n:03990474', 'n:02863750'})
    assert not table['pot'].isdisjoint(table['kettle'])
    assert table['pot'].isdisjoint(table['saucepan'])
    assert not table['cook'].isdisjoint(table['prepare'])
    # same-offset ids never collide across POS; multi-word lemmas skipped
    assert 'a_posteriori' not in table


def test_meteor_synonym_stage(tmp_path, monkeypatch):
    """Synonyms (shared synset) match at weight 0.8 when the WordNet dir
    is provided; unrelated word pairs are unaffected."""
    d = _write_wordnet_dict(tmp_path)
    # hermetic baseline: a calibration shell may export real artifacts
    for var in ('DVC_METEOR_WORDNET', 'DVC_METEOR_JAR',
                'DVC_METEOR_PARAPHRASE'):
        monkeypatch.delenv(var, raising=False)
    gts = {'a': ['cook the pot'], 'b': ['wash the pan']}
    res = {'a': ['prepare the kettle'], 'b': ['wash the cup']}
    base_mean, base = S.meteor_compute_score(gts, res)
    monkeypatch.setenv('DVC_METEOR_WORDNET', str(d))
    syn_mean, syn = S.meteor_compute_score(gts, res)
    assert syn[0] > base[0]        # cook~prepare, pot~kettle now align
    assert syn[1] == base[1]       # no synonym coverage: unchanged
    assert syn_mean > base_mean
    # synonym matches score below exact matches (weight .8 < 1.0)
    exact_mean, _ = S.meteor_compute_score({'a': ['cook the pot']},
                                           {'a': ['cook the pot']})
    assert syn[0] < exact_mean


# ---------------------------------------------------------------------------
# Exact alignment resolution: brute-force oracle
# ---------------------------------------------------------------------------

def _brute_force_resolve(cands, hyp, ref):
    """Exhaustive optimum of the published meteor-1.5 resolution objective
    (max covered words, min chunks, min distance, max weight): the oracle
    the beam search must reproduce on short sentences."""
    best_key, best = None, ((), 0)
    n = len(cands)

    def rec(idx, hmask, rmask, chosen):
        nonlocal best_key, best
        if idx == n:
            cov, chunks, dist, wsum = S._alignment_stats(chosen)
            key = (-cov, chunks, dist, -wsum)
            if best_key is None or key < best_key:
                best_key = key
                best = (tuple(sorted(chosen)), chunks)
            return
        rec(idx + 1, hmask, rmask, chosen)
        h, hl, r, rl, _w = cands[idx]
        hm = ((1 << hl) - 1) << h
        rm = ((1 << rl) - 1) << r
        if not (hmask & hm) and not (rmask & rm):
            rec(idx + 1, hmask | hm, rmask | rm, chosen + [cands[idx]])

    rec(0, 0, 0, [])
    return best


def test_meteor_beam_matches_bruteforce_oracle(monkeypatch):
    """The beam aligner equals the exhaustive optimum over every pair of
    short sentences from a small ambiguous vocabulary (repeated words force
    crossing/one-to-one resolution decisions a greedy matcher gets wrong)."""
    import itertools

    for var in ('DVC_METEOR_WORDNET', 'DVC_METEOR_JAR',
                'DVC_METEOR_PARAPHRASE'):
        monkeypatch.delenv(var, raising=False)
    vocab = ['stir', 'the', 'pot', 'stirs']
    checked = 0
    for lh in (1, 2, 3):
        for lr in (1, 2, 3):
            for hyp in itertools.product(vocab, repeat=lh):
                for ref in itertools.product(vocab, repeat=lr):
                    cands = S._collect_matches(list(hyp), list(ref))
                    if not cands:
                        continue
                    got_m, got_ch = S._resolve_alignment(cands, lh)
                    exp_m, exp_ch = _brute_force_resolve(cands, hyp, ref)
                    got = S._score_alignment(list(hyp), list(ref),
                                             tuple(sorted(got_m)), got_ch)
                    exp = S._score_alignment(list(hyp), list(ref),
                                             exp_m, exp_ch)
                    assert S._alignment_stats(got_m) == \
                        S._alignment_stats(exp_m), (hyp, ref)
                    assert got == exp, (hyp, ref, got_m, exp_m)
                    checked += 1
    assert checked > 1000


def test_meteor_beam_oracle_with_paraphrases(tmp_path, monkeypatch):
    """Oracle parity holds with phrase (multi-word) paraphrase matches in
    play — the case where span overlap resolution actually bites."""
    import itertools

    for var in ('DVC_METEOR_WORDNET', 'DVC_METEOR_JAR',
                'DVC_METEOR_PARAPHRASE'):
        monkeypatch.delenv(var, raising=False)
    p = tmp_path / 'para.txt'
    p.write_text('stir the ||| mix the\nthe pot ||| the pan\n'
                 'stir ||| mix\npot ||| pan\n')
    table = S.load_paraphrase_table(str(p))
    vocab = ['stir', 'the', 'pot', 'mix', 'pan']
    rng_pairs = itertools.islice(
        ((h, r) for h in itertools.product(vocab, repeat=3)
         for r in itertools.product(vocab, repeat=3)), 0, None, 7)
    checked = 0
    for hyp, ref in rng_pairs:
        cands = S._collect_matches(list(hyp), list(ref), paraphrases=table)
        if not cands:
            continue
        got_m, got_ch = S._resolve_alignment(cands, 3)
        exp_m, exp_ch = _brute_force_resolve(cands, hyp, ref)
        got = S._score_alignment(list(hyp), list(ref),
                                 tuple(sorted(got_m)), got_ch)
        exp = S._score_alignment(list(hyp), list(ref), exp_m, exp_ch)
        assert S._alignment_stats(got_m) == S._alignment_stats(exp_m), \
            (hyp, ref)
        assert got == exp, (hyp, ref, got_m, exp_m)
        checked += 1
    assert checked > 1500


def test_meteor_crossing_alignment_beats_greedy():
    """'b a' vs 'a b': both words match; the resolved alignment must keep
    both (coverage first) and count 2 chunks (crossed)."""
    cands = S._collect_matches(['b', 'a'], ['a', 'b'])
    matches, chunks = S._resolve_alignment(cands, 2)
    assert len(matches) == 2 and chunks == 2
    # identical order: 1 chunk
    cands = S._collect_matches(['a', 'b'], ['a', 'b'])
    matches, chunks = S._resolve_alignment(cands, 2)
    assert len(matches) == 2 and chunks == 1


def test_meteor_repeated_word_minimizes_chunks():
    """hyp 'a x a' vs ref 'a a x': coverage first (all 3 words pair), then
    chunks — a0->a1,x1->x2 form one contiguous run, so the optimum is
    2 chunks (a naive left-to-right greedy pairs a0->a0 and lands on 3)."""
    hyp, ref = ['a', 'x', 'a'], ['a', 'a', 'x']
    cands = S._collect_matches(hyp, ref)
    matches, chunks = S._resolve_alignment(cands, 3)
    assert len(matches) == 3
    cov, ch, dist, _ = S._alignment_stats(matches)
    assert cov == 6
    assert ch == chunks == 2
    assert dist == 4    # chunks dominate: beats the dist-2, 3-chunk pairing
