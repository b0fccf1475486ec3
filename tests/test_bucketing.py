"""Caption-length bucketing: identical losses, shorter scans."""
import jax
import numpy as np

from dvc_tpu.train import Trainer
from test_model import make_batch, tiny_opt
import pytest

pytestmark = pytest.mark.heavy


def test_bucketing_loss_identical():
    opt = tiny_opt(msda_impl='ref', max_caption_len=16)
    rng = np.random.default_rng(0)
    batch = {k: np.asarray(v) for k, v in
             make_batch(rng, Lc=8).items()}
    # pad captions to a longer static length with fully masked tail
    pad = 8
    batch['cap_tensor'] = np.concatenate(
        [batch['cap_tensor'],
         np.zeros(batch['cap_tensor'].shape[:2] + (pad,), np.int32)], -1)
    batch['cap_mask'] = np.concatenate(
        [batch['cap_mask'],
         np.zeros(batch['cap_mask'].shape[:2] + (pad,), bool)], -1)

    losses = {}
    for bucketing in (0, 1):
        opt.caption_len_bucketing = bucketing
        trainer = Trainer(opt)
        state = trainer.init_state(batch, seed=0)
        state, l = trainer.train_step(state, dict(batch), 1e-4, 0.0,
                                      jax.random.PRNGKey(0))
        losses[bucketing] = float(l['total_loss'])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5, atol=1e-5)


def test_bucket_shapes():
    batch = {'cap_tensor': np.zeros((2, 3, 30), np.int32),
             'cap_mask': np.zeros((2, 3, 30), bool)}
    batch['cap_mask'][0, 0, :9] = True
    out = Trainer.bucket_caption_length(batch)
    assert out['cap_tensor'].shape[-1] == 16  # ceil(9/8)*8
    batch['cap_mask'][1, 2, :29] = True
    out = Trainer.bucket_caption_length(batch)
    assert out['cap_tensor'].shape[-1] == 30  # capped at static Lc
