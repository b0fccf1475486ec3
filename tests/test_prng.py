"""step_prng_key: both PRNG impls drive a training step (CPU).

The rbg default exists for TPU throughput (threefry dropout-bit
generation costs ~2 ms/step at flagship shapes — trainer.step_prng_key
docstring); these tests pin that either stream runs the step and that
--tpu_prng threefry restores legacy PRNGKey-typed keys exactly."""
import jax
import numpy as np

from dvc_tpu.train import Trainer
from dvc_tpu.train.trainer import step_prng_key
from test_model import make_batch, tiny_opt


def test_threefry_option_is_legacy_key():
    opt = tiny_opt(tpu_prng='threefry')
    k = step_prng_key(opt, 7)
    np.testing.assert_array_equal(np.asarray(k),
                                  np.asarray(jax.random.PRNGKey(7)))


def test_both_impls_run_a_dropout_step():
    batch = {k: np.asarray(v) for k, v in
             make_batch(np.random.default_rng(0)).items()}
    losses = {}
    for impl in ('threefry', 'rbg'):
        opt = tiny_opt(msda_impl='ref', tpu_prng=impl)
        tr = Trainer(opt)
        state = tr.init_state(batch, seed=0)
        rng = step_prng_key(opt, 42)
        state, out = tr.train_step(state, batch, 1e-4, 0.0, rng)
        losses[impl] = float(out['total_loss'])
        assert np.isfinite(losses[impl])
    # different bitstreams -> different dropout masks, same order of
    # magnitude (loose sanity bound, not a parity claim)
    assert abs(losses['rbg'] - losses['threefry']) < 0.5 * (
        abs(losses['threefry']) + 1.0)
