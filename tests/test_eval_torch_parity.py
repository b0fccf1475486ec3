"""Cross-implementation EVAL parity: flax greedy decode + PostProcess vs
the reference torch PDVC in eval mode, same converted weights, same batch.

Covers what the train-parity test cannot: the greedy sampling loop
(``pdvc/CaptioningHead/LSTM.py:94-139`` / ``LSTM_DSA.py:118-186``), the
eval-path box branch (``pdvc/pdvc.py:202-211`` — ``tmp[..., :2] +=
reference``), PostProcess top-k/box/score assembly (``pdvc.py:493-546``)
and the dvc-JSON record fields (``eval_utils.py:192-208``).  Greedy tokens
must match token-for-token; numeric record fields to 1e-4.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_pdvc_torch_parity import (_STANDARD_OVER, _numpy_batch,  # noqa: E402
                                    _opt, pytestmark)  # noqa: F401


class _FakeLoader:
    """Just enough of a DataLoader for the reference PostProcess."""

    class _DS:
        pass

    def __init__(self, translator):
        self.dataset = self._DS()
        self.dataset.translator = translator


def _make_translator(tmp_path, vocab_size):
    import json

    from dvc_tpu.data.vocabulary import Translator
    words = {f'w{i}': i for i in range(1, vocab_size + 1)}
    path = os.path.join(tmp_path, 'vocab.json')
    with open(path, 'w') as f:
        json.dump({'word_to_ix': words,
                   'ix_to_word': {str(i): w for w, i in words.items()}}, f)
    return Translator(path, vocab_size)


@pytest.mark.slow
@pytest.mark.parametrize('over', [{}, _STANDARD_OVER],
                         ids=['light', 'standard_dsa'])
def test_eval_greedy_and_postprocess_parity(over, tmp_path):
    opt = _opt(**over)
    from pdvc.pdvc import build as ref_build
    torch.manual_seed(11)
    model, criterion, postprocessors = ref_build(opt)
    model.eval()

    batch, dt = _numpy_batch(opt)
    B = opt.batch_size
    durations = batch['video_length'][:, 1]
    translator = _make_translator(str(tmp_path), opt.vocab_size)

    with torch.no_grad():
        ref_out, ref_loss = model(dt, criterion, opt.transformer_input_type,
                                  eval_mode=True)
        ref_results = postprocessors['bbox'](
            ref_out, torch.from_numpy(durations), _FakeLoader(translator))
    ref_loss = {k: float(v) for k, v in ref_loss.items()}

    import jax
    import jax.numpy as jnp

    from dvc_tpu.models.pdvc_converter import convert_pdvc
    from dvc_tpu.models.postprocess import postprocess, to_dvc_records
    from dvc_tpu.train import Trainer

    trainer = Trainer(opt)
    state = trainer.init_state(batch, seed=0)
    params = convert_pdvc(model.state_dict(), state['params'])
    params = jax.tree_util.tree_map(jnp.asarray, params)

    out, losses = trainer.model.apply({'params': params}, batch,
                                      eval_mode=True)
    losses = {k: float(v) for k, v in losses.items()}

    # ---- eval-mode loss parity (exercises the eval box branch) --------
    common = sorted(set(ref_loss) & set(losses))
    for must in ('loss_ce', 'loss_bbox', 'loss_giou', 'loss_counter'):
        assert must in common
    mism = {k: (losses[k], ref_loss[k]) for k in common
            if not np.isclose(losses[k], ref_loss[k], rtol=2e-4, atol=1e-5)}
    assert not mism, f'eval loss mismatches (flax, torch): {mism}'

    # ---- greedy tokens: token-for-token -------------------------------
    ref_seq = ref_out['seq'].numpy()                     # (B, Nq, Lt)
    flax_seq = np.asarray(out['seq'])                    # (B, Nq, Lmax)
    Lt = ref_seq.shape[-1]
    assert (flax_seq[:, :, :Lt] == ref_seq).all(), (
        'greedy token mismatch: '
        f'{(flax_seq[:, :, :Lt] != ref_seq).sum()} tokens differ')
    assert (flax_seq[:, :, Lt:] == 0).all()

    # per-token greedy logprobs on live (pre-EOS) tokens
    ref_lp = ref_out['caption_probs']['cap_prob_eval'].numpy()
    flax_lp = np.asarray(out['cap_prob_eval'])
    live = ref_seq > 0
    np.testing.assert_allclose(flax_lp[:, :, :Lt][live], ref_lp[live],
                               rtol=2e-4, atol=1e-5)

    # ---- PostProcess parity -------------------------------------------
    post = postprocess(out, jnp.asarray(durations))
    records = to_dvc_records(post, [f'v{b}' for b in range(B)], durations,
                             translator)
    for b in range(B):
        ref_r = ref_results[b]
        items = records[f'v{b}']
        np.testing.assert_allclose(np.asarray(post['scores'][b]),
                                   ref_r['scores'].numpy(), rtol=1e-4,
                                   atol=1e-6, err_msg='proposal scores')
        np.testing.assert_allclose(np.asarray(post['boxes'][b]),
                                   ref_r['boxes'].numpy(), rtol=1e-4,
                                   atol=1e-4, err_msg='timestamps')
        assert (np.asarray(post['query_id'][b])
                == ref_r['query_id'].numpy()).all()
        assert int(post['pred_count'][b]) == int(ref_r['pred_seq_len'])
        for q, item in enumerate(items):
            assert item['sentence'] == ref_r['captions'][q], (
                f'b={b} q={q}: {item["sentence"]!r} vs '
                f'{ref_r["captions"][q]!r}')
            assert np.isclose(item['sentence_score'],
                              float(ref_r['caption_scores'][q]),
                              rtol=1e-4, atol=1e-5)
            assert item['pred_event_count'] == int(ref_r['pred_seq_len'])
