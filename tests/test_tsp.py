"""TSP backbone tests (tiny inputs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.models.tsp import (MViTConfig, MViTV2, TSPModel, VideoResNet,
                                tsp_cross_entropy)


@pytest.mark.heavy
def test_videoresnet_r3d():
    model = VideoResNet(conv_type='r3d', layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats.shape == (1, 512)


@pytest.mark.heavy
def test_videoresnet_r2plus1d():
    model = VideoResNet(conv_type='r2plus1d', layers=(1, 1, 1, 1))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 4, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats.shape == (2, 512)
    assert np.all(np.isfinite(np.asarray(feats)))


@pytest.mark.heavy
def test_mvit_tiny():
    cfg = MViTConfig(embed_dim=8, depths=(1, 1), heads=(1, 2),
                     temporal_size=4, spatial_size=32, kv_stride0=2,
                     feature_dim=16)
    model = MViTV2(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 4, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    # two stages: dim doubles once -> 16
    assert feats.shape == (1, 16)
    assert np.all(np.isfinite(np.asarray(feats)))


@pytest.mark.heavy
def test_tsp_model_two_heads():
    model = TSPModel(backbone='r3d_18', num_classes=(5, 2), num_heads=2)
    x = jnp.zeros((2, 4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    logits, feats = model.apply(params, x, return_features=True)
    assert logits[0].shape == (2, 5)
    assert logits[1].shape == (2, 2)
    assert feats.shape == (2, 512)


def test_tsp_cross_entropy_ignore_index():
    logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0], [5.0, -5.0]])
    labels = jnp.asarray([0, 1, -1])
    loss = tsp_cross_entropy(logits, labels)
    # ignored row does not contribute
    loss2 = tsp_cross_entropy(logits[:2], labels[:2])
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)
