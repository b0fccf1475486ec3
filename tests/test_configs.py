"""Every shipped recipe parses and builds a valid model config."""
import glob
import os

import pytest

from dvc_tpu.models import PDVCConfig
from dvc_tpu.utils.config import load_config

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize('path', sorted(
    glob.glob(os.path.join(ROOT, 'cfgs', '*.yml'))))
def test_config_parses_and_builds(path):
    opt = load_config(path, root=ROOT)
    assert opt.id
    cfg = PDVCConfig.from_opt(opt)
    assert cfg.hidden_dim % cfg.nheads == 0
    assert cfg.caption.cap_num_feature_levels <= cfg.num_feature_levels
    if opt.caption_decoder_type == 'none':
        assert opt.caption_loss_coef == 0


def test_inheritance_chain_override():
    opt = load_config(os.path.join(ROOT, 'cfgs', 'yc2_tsp_pdvc.yml'),
                      root=ROOT)
    # leaf overrides the chain
    assert opt.feature_dim == 512
    assert opt.vocab_size == 1607
    # inherited from anet_c3d_pdvc: standard head with att_hid 512
    assert opt.caption_decoder_type == 'standard'
    assert opt.att_hid_size == 512
    # inherited from the root pdvcl recipe
    assert opt.with_box_refine == 1
    assert opt.count_loss_coef == 0.5


def test_all_26_reference_recipes_shipped():
    """Recipe-for-recipe parity with /root/reference/cfgs (SURVEY.md §2.7):
    a reference user's config name keeps working unchanged."""
    ref_dir = '/root/reference/cfgs'
    if not os.path.isdir(ref_dir):
        pytest.skip('reference cfgs not available')
    ref = {os.path.basename(p) for p in glob.glob(ref_dir + '/*.yml')}
    ours = {os.path.basename(p)
            for p in glob.glob(os.path.join(ROOT, 'cfgs', '*.yml'))}
    assert ref - ours == set(), f'missing recipes: {sorted(ref - ours)}'
