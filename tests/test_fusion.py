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
