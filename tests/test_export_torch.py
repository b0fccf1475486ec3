"""Roundtrip tests for the flax -> torch checkpoint EXPORT direction.

``export_pdvc``/``export_fusion`` must be exact inverses of
``convert_pdvc``/``convert_fusion``: exporting a flax tree to the
reference state_dict layout and importing it back reproduces every leaf
bit-for-bit.  This both provides checkpoint interop back to the reference
stack and hardens the importer (any silently-dropped or misrouted tensor
breaks the roundtrip).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.models import PDVC, PDVCConfig
from dvc_tpu.models.pdvc_converter import (
    convert_fusion,
    convert_pdvc,
    export_fusion,
    export_pdvc,
)
from dvc_tpu.utils.config import load_config

from test_model import make_batch, tiny_opt


def _leaves(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaves(v, prefix + (k,))
    else:
        yield prefix, np.asarray(tree)


def _assert_trees_equal(a, b):
    la = dict(_leaves(a))
    lb = dict(_leaves(b))
    assert set(la) == set(lb), (
        sorted(set(la) ^ set(lb))[:10])
    for k in la:
        np.testing.assert_array_equal(la[k], lb[k], err_msg='/'.join(k))


def _init_pdvc(**over):
    opt = tiny_opt(**over)
    cfg = PDVCConfig.from_opt(opt)
    model = PDVC(cfg)
    batch = make_batch(np.random.default_rng(0))
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1),
         'sample': jax.random.PRNGKey(2)},
        batch, eval_mode=False)
    return opt, variables['params']


@pytest.mark.parametrize('over', [
    dict(caption_decoder_type='light'),
    dict(caption_decoder_type='standard'),
    dict(caption_decoder_type='standard', with_box_refine=False,
         share_caption_head=True),
], ids=['light-refine', 'dsa-refine', 'dsa-shared-norefine'])
def test_pdvc_export_roundtrip(over):
    opt, params = _init_pdvc(**over)
    sd = export_pdvc(params, dec_layers=opt.dec_layers)
    back = convert_pdvc(sd, flax_params=params)
    _assert_trees_equal(params, back)


def test_export_shared_heads_replicate():
    opt, params = _init_pdvc(caption_decoder_type='light',
                             with_box_refine=False, share_caption_head=True)
    sd = export_pdvc(params, dec_layers=opt.dec_layers)
    # the reference's aliased ModuleList serializes one copy per layer
    for li in range(opt.dec_layers):
        assert f'class_head.{li}.weight' in sd
        assert f'caption_head.{li}.embed.weight' in sd
    np.testing.assert_array_equal(sd['class_head.0.weight'],
                                  sd['class_head.1.weight'])


def test_fusion_export_roundtrip():
    from dvc_tpu.models.fusion import FusionPDVC

    opt = tiny_opt(caption_decoder_type='light', feature_dim=16)
    cfg = PDVCConfig.from_opt(opt)
    fmodel = FusionPDVC(cfg, fusion_dim=16, fusion_heads=4)
    batch = make_batch(np.random.default_rng(1))
    batch['sound_tensor'] = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 24, 16))
        .astype(np.float32))
    batch['sound_mask'] = jnp.ones((2, 24), bool)
    variables = fmodel.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1),
         'sample': jax.random.PRNGKey(2)},
        batch, eval_mode=False)
    params = variables['params']
    sd = export_fusion(params, dec_layers=opt.dec_layers)
    assert any(k.startswith('pdvcModel.') for k in sd)
    assert 'mha1.in_proj_weight' in sd and 'mlp_seq2.1.weight' in sd
    back = convert_fusion(sd, flax_params=params)
    _assert_trees_equal(params, back)
