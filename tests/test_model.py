"""PDVC model forward/backward smoke + semantics tests (tiny shapes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.models import PDVC, PDVCConfig, build_weight_dict
from dvc_tpu.utils.config import load_config


def tiny_opt(**kw):
    d = dict(hidden_dim=64, nheads=4, enc_layers=2, dec_layers=2,
             transformer_ff_dim=64, num_queries=10, vocab_size=20,
             input_encoding_size=32, rnn_size=64, att_hid_size=32,
             max_caption_len=8, feature_dim=16, frame_embedding_num=24,
             num_feature_levels=4, with_box_refine=True,
             caption_decoder_type='light', max_eseq_length=10,
             caption_loss_coef=1.0, count_loss_coef=0.5,
             cap_num_feature_levels=4, msda_impl='ref')
    d.update(kw)
    return load_config(**d)


def make_batch(rng, B=2, T=24, C=16, G=3, Lc=8):
    feats = rng.standard_normal((B, T, C)).astype(np.float32)
    mask = np.ones((B, T), bool)
    mask[1, 20:] = False
    length = np.stack([mask.sum(1), np.full(B, 30.0), np.full(B, G)],
                      1).astype(np.float32)
    centers = rng.uniform(0.2, 0.8, (B, G))
    lens = rng.uniform(0.05, 0.3, (B, G))
    boxes = np.stack([centers, lens], -1).astype(np.float32)
    gt_mask = np.ones((B, G), bool)
    gt_mask[0, 2] = False
    caps = rng.integers(1, 20, (B, G, Lc)).astype(np.int32)
    caps[:, :, 0] = 0
    caps[:, :, -1] = 0
    cap_mask = np.ones((B, G, Lc), bool)
    cap_mask[:, :, 6:] = False
    caps[:, :, 6:] = 0
    cap_mask[:, :, 5] = True
    caps[:, :, 5] = 0  # EOS
    return {
        'video_tensor': jnp.asarray(feats),
        'video_mask': jnp.asarray(mask),
        'video_length': jnp.asarray(length),
        'gt_boxes': jnp.asarray(boxes),
        'gt_boxes_mask': jnp.asarray(gt_mask),
        'gt_labels': jnp.zeros((B, G), jnp.int32),
        'cap_tensor': jnp.asarray(caps),
        'cap_mask': jnp.asarray(cap_mask),
    }


@pytest.fixture(scope='module', params=['light', 'standard'])
def model_and_params(request):
    opt = tiny_opt(caption_decoder_type=request.param)
    cfg = PDVCConfig.from_opt(opt)
    model = PDVC(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    params = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1),
         'sample': jax.random.PRNGKey(2)},
        batch, eval_mode=False)
    return opt, model, params, batch


def test_train_forward_losses(model_and_params):
    opt, model, params, batch = model_and_params
    out, losses = model.apply(
        params, batch, eval_mode=False, ss_prob=0.1,
        rngs={'dropout': jax.random.PRNGKey(3),
              'sample': jax.random.PRNGKey(4)})
    # per-layer loss keys incl. aux suffixes
    for k in ['loss_ce', 'loss_bbox', 'loss_giou', 'loss_counter',
              'loss_caption', 'loss_ce_0', 'loss_caption_0']:
        assert k in losses, sorted(losses)
        assert np.isfinite(float(losses[k])), (k, losses[k])
    assert out['pred_boxes'].shape == (2, 10, 2)
    wd = build_weight_dict(opt)
    total = sum(float(losses[k]) * v for k, v in wd.items() if k in losses)
    assert np.isfinite(total)


@pytest.mark.heavy
def test_train_backward(model_and_params):
    opt, model, params, batch = model_and_params
    wd = build_weight_dict(opt)

    def loss_fn(p):
        _, losses = model.apply(
            p, batch, eval_mode=False,
            rngs={'dropout': jax.random.PRNGKey(3),
                  'sample': jax.random.PRNGKey(4)})
        return sum(losses[k] * v for k, v in wd.items() if k in losses)

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # key projections must receive gradient
    gp = g['params']
    assert np.abs(np.asarray(gp['query_embed'])).sum() > 0
    assert np.abs(np.asarray(
        gp['encoder_layer_0']['self_attn']['value_proj']['kernel'])).sum() > 0


def test_eval_forward(model_and_params):
    opt, model, params, batch = model_and_params
    out, losses = model.apply(params, batch, eval_mode=True)
    assert out['seq'].shape == (2, 10, opt.max_caption_len)
    assert out['cap_prob_eval'].shape == (2, 10, opt.max_caption_len)
    assert out['pred_count'].shape == (2, opt.max_eseq_length + 1)
    # greedy decode zeroes tokens after EOS
    seq = np.asarray(out['seq'])
    for b in range(seq.shape[0]):
        for q in range(seq.shape[1]):
            s = seq[b, q]
            if (s == 0).any():
                first0 = np.argmax(s == 0)
                assert (s[first0:] == 0).all()


def test_eval_deterministic(model_and_params):
    opt, model, params, batch = model_and_params
    out1, _ = model.apply(params, batch, eval_mode=True)
    out2, _ = model.apply(params, batch, eval_mode=True)
    np.testing.assert_array_equal(np.asarray(out1['seq']),
                                  np.asarray(out2['seq']))


def test_matched_indices_are_valid(model_and_params):
    opt, model, params, batch = model_and_params
    out, _ = model.apply(
        params, batch, eval_mode=False,
        rngs={'dropout': jax.random.PRNGKey(3),
              'sample': jax.random.PRNGKey(4)})
    idx = np.asarray(out['matched_indices'])
    gt_mask = np.asarray(batch['gt_boxes_mask'])
    for b in range(idx.shape[0]):
        valid = idx[b][gt_mask[b]]
        assert len(set(valid.tolist())) == len(valid), 'queries must be distinct'
        assert (valid >= 0).all() and (valid < 10).all()


def test_no_box_refine_and_none_captioner():
    opt = tiny_opt(with_box_refine=False, caption_decoder_type='none',
                   caption_loss_coef=0.0)
    cfg = PDVCConfig.from_opt(opt)
    model = PDVC(cfg)
    batch = make_batch(np.random.default_rng(1))
    params = model.init({'params': jax.random.PRNGKey(0)}, batch,
                        eval_mode=True)
    out, losses = model.apply(params, batch, eval_mode=True)
    assert 'seq' not in out
    assert 'loss_ce' in losses
