"""Multi-device data parallelism: the same step on a 1- and 8-device mesh
must agree (the TPU-native answer to DDP correctness, SURVEY.md §2.9)."""
import jax
import numpy as np
import pytest

from dvc_tpu.parallel import make_mesh, shard_batch
from dvc_tpu.train import Trainer
from test_model import make_batch, tiny_opt

pytestmark = pytest.mark.heavy


@pytest.fixture(scope='module')
def setup():
    opt = tiny_opt(msda_impl='ref', tpu_mesh_data=1)
    rng = np.random.default_rng(0)
    batch = {k: np.asarray(v) for k, v in make_batch(rng, B=8).items()}
    return opt, batch


def test_dp_loss_matches_single_device(setup):
    opt, batch = setup
    results = {}
    for n in (1, 8):
        opt.tpu_mesh_data = n
        trainer = Trainer(opt, mesh=make_mesh(n_data=n))
        state = trainer.init_state(batch, seed=0)
        state, losses = trainer.train_step(state, dict(batch), 1e-4, 0.0,
                                           jax.random.PRNGKey(0))
        # second step exercises the updated (allreduced) params
        state, losses2 = trainer.train_step(state, dict(batch), 1e-4, 0.0,
                                            jax.random.PRNGKey(1))
        results[n] = (float(losses['total_loss']),
                      float(losses2['total_loss']))
    np.testing.assert_allclose(results[1][0], results[8][0],
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(results[1][1], results[8][1],
                               rtol=2e-3, atol=1e-3)


def test_batch_is_sharded(setup):
    opt, batch = setup
    mesh = make_mesh(n_data=8)
    sb = shard_batch(batch, mesh)
    sh = sb['video_tensor'].sharding
    assert len(sh.device_set) == 8


def test_mesh_axes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape['data'] == 4
    assert mesh.shape['model'] == 2


def test_dp_tp_mesh_loss_matches(setup):
    """2x4 data x model mesh: FFN weights shard over 'model'; the loss
    matches the single-device run."""
    opt, batch = setup
    results = {}
    for n_data, n_model in ((1, 1), (4, 2)):
        trainer = Trainer(opt, mesh=make_mesh(n_data=n_data,
                                              n_model=n_model))
        state = trainer.init_state(batch, seed=0)
        if n_model > 1:
            # the FFN kernels must actually be sharded over 'model'
            k = state['params']['params']['encoder_layer_0']['ffn'][
                'linear1']['kernel']
            assert len(k.sharding.device_set) >= n_model
        state, losses = trainer.train_step(state, dict(batch), 1e-4, 0.0,
                                           jax.random.PRNGKey(0))
        results[(n_data, n_model)] = float(losses['total_loss'])
    np.testing.assert_allclose(results[(1, 1)], results[(4, 2)],
                               rtol=2e-4, atol=1e-4)


def test_seq_shard_loss_matches():
    """Sequence parallelism (tpu_seq_shard): the encoder's flattened frame
    axis is constraint-sharded over 'model'; loss matches single-device.
    T=64 -> pyramid sum 64+32+16+8=120, divisible by the model axis."""
    rng = np.random.default_rng(0)
    batch = {k: np.asarray(v) for k, v in
             make_batch(rng, B=8, T=64).items()}
    results = {}
    for n_data, n_model, seq in ((1, 1, 0), (2, 4, 1)):
        opt = tiny_opt(msda_impl='ref', frame_embedding_num=64,
                       tpu_seq_shard=seq)
        trainer = Trainer(opt, mesh=make_mesh(n_data=n_data,
                                              n_model=n_model))
        state = trainer.init_state(batch, seed=0)
        state, losses = trainer.train_step(state, dict(batch), 1e-4, 0.0,
                                           jax.random.PRNGKey(0))
        results[(n_data, n_model)] = float(losses['total_loss'])
    np.testing.assert_allclose(results[(1, 1)], results[(2, 4)],
                               rtol=2e-4, atol=1e-4)
