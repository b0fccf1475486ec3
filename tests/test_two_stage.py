"""Two-stage (gt_proposals) mode tests (reference decide_two_stage,
misc/utils.py:31-49; prepare_decoder_input_proposal,
deformable_transformer.py:136-142)."""
import jax
import numpy as np

from dvc_tpu.models import PDVC, PDVCConfig, build_weight_dict
from test_model import make_batch, tiny_opt
import pytest

pytestmark = pytest.mark.heavy


def test_gt_proposal_forward():
    opt = tiny_opt(transformer_input_type='gt_proposals')
    cfg = PDVCConfig.from_opt(opt)
    model = PDVC(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    params = model.init({'params': jax.random.PRNGKey(0),
                         'dropout': jax.random.PRNGKey(1),
                         'sample': jax.random.PRNGKey(2)},
                        batch, eval_mode=False)
    out, losses = model.apply(
        params, batch, eval_mode=False,
        rngs={'dropout': jax.random.PRNGKey(3),
              'sample': jax.random.PRNGKey(4)})
    G = batch['gt_boxes'].shape[1]
    # queries are the gt proposals; refinement is disabled so predicted
    # boxes equal the gt boxes
    assert out['pred_boxes'].shape == (2, G, 2)
    np.testing.assert_allclose(np.asarray(out['pred_boxes']),
                               np.asarray(batch['gt_boxes']), atol=1e-6)
    assert 'loss_caption' in losses


def test_gt_proposal_weight_zeroing():
    opt = tiny_opt(transformer_input_type='gt_proposals')
    wd = build_weight_dict(opt)
    assert wd['loss_ce'] == 0
    assert wd['loss_giou'] == 0
    assert wd['loss_bbox'] == 0
    assert wd['loss_caption'] > 0
    assert wd.get('loss_ce_0', 0) == 0
