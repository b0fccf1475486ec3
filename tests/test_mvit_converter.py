"""MViTv2 torch-checkpoint conversion parity.

torchvision is absent in this environment, so ``torch_mvit_ref.TorchMViT``
re-creates torchvision's mvit_v2_s forward + state-dict layout (see its
docstring); these tests pin ``convert_mvit`` + flax ``MViTV2`` against it:
converted weights must reproduce the torch forward to float32 precision,
and malformed / mis-shaped checkpoints must fail loudly
(reference backbone.py:46-50, TSPmodel.py:70-85).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from dvc_tpu.models.tsp import (MViTConfig, MViTV2, convert_mvit,
                                mvit_block_specs)
from torch_mvit_ref import TorchMViT

pytestmark = pytest.mark.heavy

TINY = MViTConfig(embed_dim=8, depths=(1, 2), heads=(1, 2),
                  temporal_size=4, spatial_size=16, kv_stride0=2,
                  feature_dim=16)


def _tiny_torch_model(seed=0):
    specs = [(s.in_ch, s.out_ch, s.heads, s.q_stride, s.kv_stride)
             for s in mvit_block_specs(TINY)]
    tm = TorchMViT(specs, TINY.embed_dim, (2, 4, 4))
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    tm.eval()
    return tm


def _clip(seed=1, B=2):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(
        (B, TINY.temporal_size, TINY.spatial_size, TINY.spatial_size, 3)
    ).astype(np.float32)


def test_mvit_converter_forward_parity():
    tm = _tiny_torch_model()
    x = _clip()
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))),
                 return_features=True).numpy()

    model = MViTV2(TINY)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, heads = convert_mvit(tm.state_dict(), init['params'])
    assert heads == {}
    out = np.asarray(model.apply({'params': params}, jnp.asarray(x)))
    assert out.shape == ref.shape == (2, TINY.feature_dim)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-5)


def test_mvit_converter_tsp_prefix_and_heads():
    """TSP .pth layout: backbone under ``features.``, fc1/fc2 heads
    (reference TSPmodel.py:31-40)."""
    tm = _tiny_torch_model(seed=3)
    sd = {f'features.{k}': v for k, v in tm.state_dict().items()}
    sd['fc1.weight'] = torch.randn(5, TINY.feature_dim)
    sd['fc1.bias'] = torch.randn(5)
    sd['fc2.weight'] = torch.randn(2, TINY.feature_dim)
    sd['fc2.bias'] = torch.randn(2)

    x = _clip(seed=4, B=1)
    model = MViTV2(TINY)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, heads = convert_mvit(sd, init['params'])
    assert set(heads) == {'fc1', 'fc2'}
    assert heads['fc1']['kernel'].shape == (TINY.feature_dim, 5)

    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))),
                 return_features=True).numpy()
    out = np.asarray(model.apply({'params': params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-5)


def test_mvit_converter_rejects_non_mvit():
    with pytest.raises(ValueError, match='conv_proj'):
        convert_mvit({'stem.0.weight': np.zeros((45, 3, 1, 7, 7))})


def test_mvit_converter_rejects_shape_mismatch():
    """A checkpoint built for one input size must not silently load into a
    model traced at another (rel-pos tables differ)."""
    tm = _tiny_torch_model()
    bigger = MViTConfig(embed_dim=8, depths=(1, 2), heads=(1, 2),
                        temporal_size=4, spatial_size=32, kv_stride0=2,
                        feature_dim=16)
    model = MViTV2(bigger)
    x = jnp.zeros((1, 4, 32, 32, 3))
    init = model.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match='rel_pos'):
        convert_mvit(tm.state_dict(), init['params'])


def test_mvit_converter_rejects_leftover_tensors():
    tm = _tiny_torch_model()
    sd = dict(tm.state_dict())
    sd['blocks.0.attn.mystery.weight'] = torch.zeros(3)
    with pytest.raises(ValueError, match='unconsumed'):
        convert_mvit(sd)


def test_mvit_golden_manifest_cross_check():
    """Two independent transcriptions of torchvision's mvit_v2_s layout —
    the analytic golden manifest (dvc_tpu/models/tsp/mvit_manifest.py,
    derived from torchvision's construction rules) and the TorchMViT
    re-creation — must agree name-for-name and shape-for-shape at the
    canonical 16x224x224 configuration."""
    from dvc_tpu.models.tsp.mvit_manifest import (mvit_v2_s_manifest,
                                                  validate_against_manifest)
    specs = [(s.in_ch, s.out_ch, s.heads, s.q_stride, s.kv_stride)
             for s in mvit_block_specs(MViTConfig())]
    tm = TorchMViT(specs, 96, (8, 56, 56), num_classes=400)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    assert validate_against_manifest(sd) == []
    man = mvit_v2_s_manifest(with_head=False)
    assert len(man) == 395
    # spot-pin load-bearing shapes of the real torchvision layout
    assert man['conv_proj.weight'] == (96, 3, 3, 7, 7)
    assert man['blocks.0.attn.rel_pos_h'] == (111, 96)
    assert man['blocks.1.attn.qkv.weight'] == (576, 96)
    assert man['blocks.1.project.weight'] == (192, 96)
    assert man['blocks.14.attn.qkv.weight'] == (2304, 384)
    assert man['blocks.15.attn.rel_pos_h'] == (13, 96)
    assert man['blocks.15.mlp.0.weight'] == (3072, 768)


def test_mvit_manifest_rejects_layout_drift():
    """A full-size checkpoint with a drifted key name or shape fails the
    golden-manifest gate inside convert_mvit (before any flax tree is
    needed)."""
    from dvc_tpu.models.tsp.mvit_manifest import mvit_v2_s_manifest
    sd = {k: np.zeros(s, np.float32)
          for k, s in mvit_v2_s_manifest().items()}
    # rename one tensor the way a hand-rolled port might
    sd['blocks.2.attn.project.weight'] = sd.pop(
        'blocks.2.attn.project.0.weight')
    with pytest.raises(ValueError, match='golden manifest'):
        convert_mvit(sd)
    # shape drift (wrong rel-pos table length)
    sd2 = {k: np.zeros(s, np.float32)
           for k, s in mvit_v2_s_manifest().items()}
    sd2['blocks.3.attn.rel_pos_h'] = np.zeros((55, 96), np.float32)
    with pytest.raises(ValueError, match='golden manifest'):
        convert_mvit(sd2)


def test_mvit_manifest_accepts_exact_layout_with_tsp_prefix():
    """A well-formed full-size TSP fine-tune (features. prefix + fc heads)
    passes the manifest gate and converts."""
    from dvc_tpu.models.tsp.mvit_manifest import mvit_v2_s_manifest
    sd = {'features.' + k: np.zeros(s, np.float32)
          for k, s in mvit_v2_s_manifest(with_head=False).items()}
    sd['fc1.weight'] = np.zeros((200, 768), np.float32)
    sd['fc1.bias'] = np.zeros((200,), np.float32)
    params, heads = convert_mvit(sd)
    assert 'fc1' in heads
    assert params['block_15']['mlp_fc2']['kernel'].shape == (3072, 768)
