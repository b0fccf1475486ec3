"""Fusion model (NewModel equivalent) tests."""
import jax
import jax.numpy as jnp
import numpy as np

from dvc_tpu.models import PDVCConfig, build_weight_dict
from dvc_tpu.models.fusion import FusionPDVC
from test_model import make_batch, tiny_opt
import pytest


def make_fusion_batch(rng, B=2, T=24, C=16, G=3, Lc=8):
    batch = make_batch(rng, B, T, C, G, Lc)
    batch['sound_tensor'] = jnp.asarray(
        rng.standard_normal((B, T, C)).astype(np.float32))
    return batch


@pytest.mark.heavy
def test_fusion_forward_and_grad():
    opt = tiny_opt()
    cfg = PDVCConfig.from_opt(opt)
    model = FusionPDVC(cfg, fusion_dim=16, fusion_heads=4)
    rng = np.random.default_rng(0)
    batch = make_fusion_batch(rng)
    params = model.init({'params': jax.random.PRNGKey(0),
                         'dropout': jax.random.PRNGKey(1),
                         'sample': jax.random.PRNGKey(2)},
                        batch, eval_mode=False)
    wd = build_weight_dict(opt)

    def loss_fn(p):
        _, losses = model.apply(p, batch, eval_mode=False,
                                rngs={'dropout': jax.random.PRNGKey(3),
                                      'sample': jax.random.PRNGKey(4)})
        return sum(losses[k] * v for k, v in wd.items() if k in losses)

    loss, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # the audio cross-attention must receive gradient
    sound_g = g['params']['sound_ca']['mha']['query']['kernel']
    assert np.abs(np.asarray(sound_g)).sum() > 0


@pytest.mark.heavy
def test_fusion_eval_forward():
    opt = tiny_opt()
    cfg = PDVCConfig.from_opt(opt)
    model = FusionPDVC(cfg, fusion_dim=16, fusion_heads=4)
    rng = np.random.default_rng(1)
    batch = make_fusion_batch(rng)
    params = model.init({'params': jax.random.PRNGKey(0)}, batch,
                        eval_mode=True)
    out, losses = model.apply(params, batch, eval_mode=True)
    assert out['seq'].shape == (2, 10, opt.max_caption_len)


def test_fusion_bench_surface():
    """bench.py's flagship path: make_fusion_trainer +
    _synthetic_batch(with_sound=True) runs one train step (tiny shapes)."""
    from __graft_entry__ import _flagship_opt, _synthetic_batch
    from newTrain import make_fusion_trainer
    opt = _flagship_opt(frame_embedding_num=32, hidden_dim=64, nheads=4,
                        transformer_ff_dim=64, num_queries=8,
                        input_encoding_size=32, rnn_size=64, att_hid_size=32,
                        gt_proposal_sample_num=3, max_caption_len=8,
                        feature_dim=32, vocab_size=50, cap_nheads=4,
                        msda_impl='dense')
    trainer = make_fusion_trainer(opt)
    batch = _synthetic_batch(opt, B=2, with_sound=True)
    assert batch['sound_tensor'].shape == (2, 32, 32)
    state = trainer.init_state(batch)
    state, losses = trainer.train_step(state, batch, lr=1e-4, ss_prob=0.0,
                                       rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(losses['total_loss']))
    # sound branch params exist in the trained tree
    assert 'sound_ca' in state['params']['params']


def test_fusion_block_bf16_parity():
    """fusion_dtype='bfloat16' keeps f32 params and tracks the f32 loss
    within bf16 tolerance (the blocks are a perf knob, not a different
    model)."""
    opt = tiny_opt()
    cfg = PDVCConfig.from_opt(opt)
    rng = np.random.default_rng(7)
    batch = make_fusion_batch(rng)
    wd = build_weight_dict(opt)

    def run(dtype):
        model = FusionPDVC(cfg, fusion_dim=16, fusion_heads=4,
                           fusion_dtype=dtype)
        params = model.init({'params': jax.random.PRNGKey(0)}, batch,
                            eval_mode=False, deterministic=True)
        _, losses = model.apply(params, batch, eval_mode=False,
                                deterministic=True)
        return params, sum(float(losses[k]) * v for k, v in wd.items()
                           if k in losses)

    p32, l32 = run('float32')
    p16, l16 = run('bfloat16')
    assert abs(l16 - l32) / max(abs(l32), 1e-6) < 0.02
    for a, b in zip(jax.tree_util.tree_leaves(p16),
                    jax.tree_util.tree_leaves(p32)):
        assert a.dtype == b.dtype == jnp.float32


def test_fusion_without_sound():
    """Audio-free batches run (zeros fallback path)."""
    opt = tiny_opt()
    cfg = PDVCConfig.from_opt(opt)
    model = FusionPDVC(cfg, fusion_dim=16, fusion_heads=4)
    rng = np.random.default_rng(2)
    batch = make_fusion_batch(rng)
    params = model.init({'params': jax.random.PRNGKey(0)}, batch,
                        eval_mode=True)
    batch2 = dict(batch)
    batch2['sound_tensor'] = jnp.zeros_like(batch['sound_tensor'])
    out, _ = model.apply(params, batch2, eval_mode=True)
    assert np.all(np.isfinite(np.asarray(out['pred_boxes'])))
