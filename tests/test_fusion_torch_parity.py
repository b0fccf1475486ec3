"""Cross-implementation parity: flax FusionPDVC vs the reference torch
NewModel (read-only import from /root/reference), same weights, same batch.

Mirrors ``test_pdvc_torch_parity.py`` for the audio-fusion stack — the
reference's headline artifact is a NewModel checkpoint (PDVC under a
``pdvcModel.*`` prefix plus the visual self-attention / audio
cross-attention blocks, ``NewModel.py:9-65``, saved by
``newTrain.py:404-417``).  Weights transfer via ``convert_fusion``; train
losses must match to rtol 2e-4 and eval greedy tokens exactly.

torchaudio is stubbed (HuBERT runs in the data pipeline here, not inside
the model); ``get_vid_features``/``get_mfcc`` are monkeypatched to feed
the same synthetic clip/audio features both implementations see.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

REF = '/root/reference'
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, 'NewModel.py')),
    reason='reference NewModel not available')

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_torch_stubs import install as _install_stubs  # noqa: E402
from ref_torch_stubs import install_torchaudio as _install_ta  # noqa: E402

_install_stubs()
_install_ta()
if REF not in sys.path:
    sys.path.append(REF)

from test_pdvc_torch_parity import _numpy_batch, _opt  # noqa: E402

FDIM, FHEADS = 768, 32    # hard-coded in the reference (NewModel.py:21-33)

_STANDARD_OVER = dict(
    caption_decoder_type='standard', att_hid_size=64, rnn_size=512,
    caption_cost_type='loss')


def _fusion_opt(**over):
    base = dict(batch_size=1, feature_dim=FDIM)
    base.update(over)
    return _opt(**base)


def _build_ref_newmodel(opt, seed=11):
    from NewModel import NewModel
    torch.manual_seed(seed)
    model = NewModel(backbone=None, num_classes=None, num_heads=None,
                     args=opt, concat_gvf=None, device='cpu')
    model.train()
    return model


def _make_dt(opt, batch, dt, clips, sound):
    """Extend the PDVC ``dt`` with the NewModel-only keys and patchable
    feature getters (reference NewModel.py:67-85)."""
    T = clips.shape[0]
    dt = dict(dt)
    dt['video_action-label'] = None
    dt['video_temporal-region-label'] = None
    dt['video_gvf'] = None
    dt['video_segment'] = [(float(i), float(i) + 1.0) for i in range(T)]
    dt['video_filename'] = 'data/raw/v_0000000000000.mp4'
    return dt


def _setup(over, seed=3):
    opt = _fusion_opt(**over)
    batch, dt = _numpy_batch(opt, seed=seed)
    clips = batch['video_tensor'][0]                       # (T, 768)
    rng = np.random.default_rng(seed + 100)
    sound = rng.standard_normal(clips.shape).astype(np.float32)
    batch['sound_tensor'] = sound[None]
    dt = _make_dt(opt, batch, dt, clips, sound)

    model = _build_ref_newmodel(opt)
    model.get_vid_features = \
        lambda filename, visualization='no': torch.from_numpy(clips)
    model.get_mfcc = \
        lambda segments, filename, visualization='no': torch.from_numpy(sound)

    import jax
    import jax.numpy as jnp

    from dvc_tpu.models import PDVCConfig
    from dvc_tpu.models.fusion import FusionPDVC
    from dvc_tpu.models.pdvc_converter import convert_fusion

    cfg = PDVCConfig.from_opt(opt)
    fmodel = FusionPDVC(cfg, fusion_dim=FDIM, fusion_heads=FHEADS)
    variables = fmodel.init({'params': jax.random.PRNGKey(0),
                             'dropout': jax.random.PRNGKey(1),
                             'sample': jax.random.PRNGKey(2)},
                            batch, eval_mode=False)
    params = convert_fusion(model.state_dict(), variables['params'])
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return opt, batch, dt, model, fmodel, params


@pytest.mark.slow
@pytest.mark.parametrize('over', [{}, _STANDARD_OVER],
                         ids=['light', 'standard_dsa'])
def test_fusion_train_loss_parity(over):
    opt, batch, dt, model, fmodel, params = _setup(over)
    import copy

    import jax

    with torch.no_grad():
        _, ref_loss, _ = model(copy.copy(dt), None, eval_mode=False)
    ref_loss = {k: float(v) for k, v in ref_loss.items()}

    _, losses = fmodel.apply(
        {'params': params}, batch, eval_mode=False, ss_prob=0.0,
        rngs={'dropout': jax.random.PRNGKey(0),
              'sample': jax.random.PRNGKey(1)})
    losses = {k: float(v) for k, v in losses.items()}

    common = sorted(set(ref_loss) & set(losses))
    for must in ('loss_ce', 'loss_bbox', 'loss_giou', 'loss_counter',
                 'loss_self_iou', 'loss_caption', 'loss_ce_0',
                 'loss_caption_0'):
        assert must in common, f'{must} missing from common keys {common}'
    mism = {k: (losses[k], ref_loss[k]) for k in common
            if not np.isclose(losses[k], ref_loss[k], rtol=2e-4, atol=1e-5)}
    assert not mism, f'fusion loss mismatches (flax, torch): {mism}'


@pytest.mark.slow
def test_fusion_eval_greedy_parity():
    opt, batch, dt, model, fmodel, params = _setup(_STANDARD_OVER, seed=5)
    import copy

    model.eval()
    with torch.no_grad():
        ref_out, _, _ = model(copy.copy(dt), None, eval_mode=True)

    out, _ = fmodel.apply({'params': params}, batch, eval_mode=True)

    ref_seq = ref_out['seq'].numpy()                       # (B, Nq, Lt)
    flax_seq = np.asarray(out['seq'])
    Lt = ref_seq.shape[-1]
    assert (flax_seq[:, :, :Lt] == ref_seq).all(), (
        f'{(flax_seq[:, :, :Lt] != ref_seq).sum()} greedy tokens differ')
    assert (flax_seq[:, :, Lt:] == 0).all()

    ref_lp = ref_out['caption_probs']['cap_prob_eval'].numpy()
    flax_lp = np.asarray(out['cap_prob_eval'])
    live = ref_seq > 0
    np.testing.assert_allclose(flax_lp[:, :, :Lt][live], ref_lp[live],
                               rtol=5e-4, atol=1e-5)


@pytest.mark.slow
def test_convert_fusion_rejects_bare_pdvc():
    from dvc_tpu.models.pdvc_converter import convert_fusion
    with pytest.raises(ValueError, match='pdvcModel'):
        convert_fusion({'class_head.0.weight': np.zeros((2, 3))})


@pytest.mark.slow
def test_convert_fusion_discards_hubert_and_checks_leftovers():
    """sound_model.* (HuBERT) is discarded; anything else unknown raises."""
    opt = _fusion_opt()
    model = _build_ref_newmodel(opt)
    from dvc_tpu.models.pdvc_converter import convert_fusion
    sd = dict(model.state_dict())
    sd['sound_model.encoder.layer0.weight'] = torch.zeros(3, 3)
    params = convert_fusion(sd, nheads=opt.nheads)
    assert 'visual_sa' in params and 'sound_ca' in params
    assert 'pdvc' in params and 'query_embed' in params['pdvc']
    sd['rogue.weight'] = torch.zeros(2)
    with pytest.raises(ValueError, match='unconsumed'):
        convert_fusion(sd, nheads=opt.nheads)
