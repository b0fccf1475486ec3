"""Multi-step scan training equals sequential single steps."""
import jax
import numpy as np

from dvc_tpu.train import Trainer
from test_model import make_batch, tiny_opt
import pytest

pytestmark = pytest.mark.heavy


def test_train_steps_scan_matches_sequential():
    opt = tiny_opt(msda_impl='ref', drop_prob=0.0,
                   transformer_dropout_prob=0.0)
    rng = np.random.default_rng(0)
    batches = [
        {k: np.asarray(v) for k, v in make_batch(
            np.random.default_rng(i)).items()}
        for i in range(3)]

    t1 = Trainer(opt)
    s1 = t1.init_state(batches[0], seed=0)
    base_rng = jax.random.PRNGKey(42)
    # sequential: replicate the scan's rng folding
    r = base_rng
    for b in batches:
        r, r_step = jax.random.split(r)
        s1['params'], s1['opt_state'], losses_seq = t1._train_step(
            s1['params'], s1['opt_state'], b, np.float32(1e-4),
            np.float32(0.0), r_step)

    t2 = Trainer(opt)
    s2 = t2.init_state(batches[0], seed=0)
    s2, losses_scan = t2.train_steps(s2, batches, 1e-4, 0.0, base_rng)

    # two distinct XLA programs (scan vs straight-line) reduce in different
    # orders; Adam normalizes tiny gradients to +-lr, so params can differ
    # by a few lr quanta — compare at that scale, and losses tightly.
    a = jax.tree_util.tree_leaves(s1['params'])
    b = jax.tree_util.tree_leaves(s2['params'])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=5 * 1e-4, rtol=1e-2)
    assert np.asarray(losses_scan['total_loss']).shape == (3,)
    np.testing.assert_allclose(float(losses_scan['total_loss'][-1]),
                               float(losses_seq['total_loss']),
                               rtol=1e-3, atol=1e-3)
