"""End-to-end train-overfit smoke test on the synthetic dataset
(SURVEY.md §7 step 6: the first runnable milestone)."""
import jax
import numpy as np
import pytest

from dvc_tpu.data import BatchLoader, DenseCaptionDataset
from dvc_tpu.train import (Trainer, multistep_lr, ss_prob_for_epoch,
                           save_checkpoint, load_checkpoint,
                           filtered_restore)
from dvc_tpu.utils.config import load_config
from synth import make_synth_dataset

pytestmark = pytest.mark.heavy


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp('e2e')
    anno, feats, vocab, vsize = make_synth_dataset(str(root))
    opt = load_config(
        vocab_size=vsize, visual_feature_type='tsp', feature_dim=16,
        frame_embedding_num=24, gt_proposal_sample_num=4, max_caption_len=10,
        invalid_video_json=[], hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=2, transformer_ff_dim=64, num_queries=10,
        input_encoding_size=32, rnn_size=64, att_hid_size=0,
        with_box_refine=True, caption_decoder_type='light',
        caption_loss_coef=1.0, count_loss_coef=0.5, batch_size=3,
        lr=1e-3, epoch=4, learning_rate_decay_start=2,
        learning_rate_decay_every=1, learning_rate_decay_rate=0.5,
        msda_impl='ref', max_eseq_length=10)
    ds = DenseCaptionDataset(anno, feats, vocab, True, opt)
    loader = BatchLoader(ds, opt.batch_size, shuffle=True, opt=opt)
    trainer = Trainer(opt)
    batch0, _ = next(iter(loader))
    state = trainer.init_state(batch0)
    return opt, trainer, loader, state, ds


def test_lr_schedule():
    opt = load_config(lr=1e-4, epoch=30, learning_rate_decay_start=8,
                      learning_rate_decay_every=3,
                      learning_rate_decay_rate=0.5)
    assert multistep_lr(opt, 0) == 1e-4
    assert multistep_lr(opt, 8) == pytest.approx(5e-5)
    assert multistep_lr(opt, 11) == pytest.approx(2.5e-5)


def test_ss_prob():
    opt = load_config(scheduled_sampling_start=1, basic_ss_prob=0,
                      scheduled_sampling_increase_every=2,
                      scheduled_sampling_increase_prob=0.05,
                      scheduled_sampling_max_prob=0.25)
    assert ss_prob_for_epoch(opt, 0) == 0
    assert ss_prob_for_epoch(opt, 3) == pytest.approx(0.05)
    assert ss_prob_for_epoch(opt, 30) == 0.25


def test_overfit_loss_decreases(setup):
    opt, trainer, loader, state, ds = setup
    rng = jax.random.PRNGKey(0)
    losses_first, losses_last = None, None
    n_steps = 0
    for epoch in range(8):
        lr = multistep_lr(opt, epoch)
        for batch, meta in loader:
            rng, step_rng = jax.random.split(rng)
            state, losses = trainer.train_step(state, batch, lr, 0.0,
                                               step_rng)
            if losses_first is None:
                losses_first = {k: float(v) for k, v in losses.items()}
            losses_last = {k: float(v) for k, v in losses.items()}
            n_steps += 1
    assert n_steps >= 16
    assert losses_last['total_loss'] < losses_first['total_loss'] * 0.8, (
        losses_first['total_loss'], losses_last['total_loss'])
    assert np.isfinite(losses_last['total_loss'])
    # keep state for eval test
    setup_state['state'] = state


setup_state = {}


def test_eval_step_and_records(setup):
    opt, trainer, loader, state, ds = setup
    state = setup_state.get('state', state)
    from dvc_tpu.models import postprocess, to_dvc_records
    batch, meta = next(iter(loader))
    out, losses = trainer.eval_step(state, batch)
    import jax.numpy as jnp
    post = postprocess(out, jnp.asarray(meta['durations']))
    records = to_dvc_records(post, meta['keys'], meta['durations'],
                             ds.translator)
    assert set(records.keys()) == set(meta['keys'])
    first = records[meta['keys'][0]][0]
    assert {'timestamp', 'proposal_score', 'sentence', 'sentence_score',
            'query_id', 'pred_event_count'} <= set(first)
    ts = first['timestamp']
    assert 0 <= ts[0] <= ts[1] <= meta['durations'][0] + 1e-3


def test_checkpoint_roundtrip(setup, tmp_path):
    opt, trainer, loader, state, ds = setup
    # the fixture's initial state buffers were donated by train_step;
    # use the post-training state
    state = setup_state.get('state', state)
    path = save_checkpoint(str(tmp_path), 'last', state, epoch=3)
    ck = load_checkpoint(path)
    assert ck['epoch'] == 3
    restored = filtered_restore(state['params'], ck['params'], 'full')
    a = jax.tree_util.tree_leaves(restored)
    b = jax.tree_util.tree_leaves(state['params'])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # encoder-only restore keeps decoder params untouched
    zeros = jax.tree_util.tree_map(np.zeros_like, state['params'])
    enc_only = filtered_restore(zeros, ck['params'], 'encoder')
    flat = jax.tree_util.tree_flatten_with_path(enc_only)[0]
    saw_enc = saw_dec = False
    for path_k, val in flat:
        ps = '/'.join(str(p) for p in path_k)
        if 'base_encoder' in ps:
            saw_enc = saw_enc or np.abs(np.asarray(val)).sum() > 0
        if 'caption_head' in ps:
            saw_dec = saw_dec or np.abs(np.asarray(val)).sum() == 0
    assert saw_enc and saw_dec


def test_checkpoint_orbax_roundtrip(setup, tmp_path):
    opt, trainer, loader, state, ds = setup
    state = setup_state.get('state', state)
    path = save_checkpoint(str(tmp_path), 'last', state, epoch=2,
                           backend='orbax')
    ck = load_checkpoint(path)
    assert int(ck['epoch']) == 2
    a = jax.tree_util.tree_leaves(ck['params'])
    b = jax.tree_util.tree_leaves(state['params'])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
