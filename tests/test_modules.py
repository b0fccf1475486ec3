"""Unit tests for model submodules: position encoding, base encoder,
prefetch loader, caption NLL."""
import jax
import jax.numpy as jnp
import numpy as np

from dvc_tpu.data.prefetch import PrefetchLoader
from dvc_tpu.models.base_encoder import (BaseEncoder, downsample_mask,
                                         pyramid_shapes)
from dvc_tpu.models.caption_heads import caption_nll
from dvc_tpu.models.position_encoding import PositionEmbeddingSine


def test_pyramid_shapes():
    assert pyramid_shapes(200, 4) == (200, 100, 50, 25)
    assert pyramid_shapes(100, 4) == (100, 50, 25, 13)


def test_downsample_mask_nearest():
    m = jnp.asarray([[False] * 6 + [True] * 2])  # pad at the end
    out = np.asarray(downsample_mask(m, 4))
    # floor(i * 8 / 4) -> indices 0,2,4,6
    np.testing.assert_array_equal(out[0], [False, False, False, True])


def test_position_embedding_formula():
    """First sine channel equals sin(normalized cumsum * 2pi / dim_t[0])."""
    mod = PositionEmbeddingSine(num_pos_feats=8, max_duration=16)
    pad = jnp.zeros((1, 5), bool)
    dur = jnp.asarray([10.0])
    params = mod.init(jax.random.PRNGKey(0), pad, dur)
    pos = np.asarray(mod.apply(params, pad, dur))
    assert pos.shape == (1, 5, 16)
    x = np.cumsum(np.ones(5))
    x = (x - 0.5) / (x[-1] + 1e-6) * (2 * np.pi)
    np.testing.assert_allclose(pos[0, :, 0], np.sin(x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pos[0, :, 1], np.cos(x), rtol=1e-5, atol=1e-5)
    # duration half is constant across time
    assert np.allclose(pos[0, 0, 8:], pos[0, 3, 8:])


def test_base_encoder_shapes_and_masks():
    enc = BaseEncoder(num_feature_levels=3, vf_dim=8, hidden_dim=64)
    vf = jnp.zeros((2, 20, 8))
    pad = jnp.zeros((2, 20), bool).at[1, 15:].set(True)
    dur = jnp.asarray([30.0, 20.0])
    params = enc.init(jax.random.PRNGKey(0), vf, pad, dur)
    srcs, masks, poses = enc.apply(params, vf, pad, dur)
    assert [s.shape[1] for s in srcs] == [20, 10, 5]
    assert all(s.shape[2] == 64 for s in srcs)
    assert all(p.shape == s.shape for p, s in zip(poses, srcs))
    # downsampled pad mask keeps padding at the tail
    assert bool(np.asarray(masks[1])[1, -1])


def test_caption_nll():
    # 2 captions, 3 steps, vocab 4
    lp = jnp.log(jnp.full((2, 3, 4), 0.25))
    tgt = jnp.asarray([[1, 2, 0], [3, 0, 0]])
    mask = jnp.asarray([[True, True, True], [True, True, False]])
    out = np.asarray(caption_nll(lp, tgt, mask))
    np.testing.assert_allclose(out[0], -np.log(0.25) * 3 / 3, rtol=1e-4)
    np.testing.assert_allclose(out[1], -np.log(0.25) * 2 / 2, rtol=1e-4)


def test_prefetch_loader():
    data = [(i, {'k': i}) for i in range(7)]
    out = list(PrefetchLoader(iter_factory(data), depth=2))
    assert out == data


def iter_factory(data):
    class L:
        def __len__(self):
            return len(data)

        def __iter__(self):
            return iter(data)
    return L()


def test_prefetch_propagates_errors():
    class Bad:
        def __iter__(self):
            yield 1
            raise RuntimeError('boom')

    import pytest
    with pytest.raises(RuntimeError):
        list(PrefetchLoader(Bad()))
