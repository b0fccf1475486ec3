"""TSP trainer tests: schedule parity, per-group LR masking, train step."""
import jax
import jax.numpy as jnp
import numpy as np

from dvc_tpu.train.tsp_trainer import (TSPTrainer, lr_multiplier_tree,
                                       warmup_multistep_lr)
from dvc_tpu.utils.config import load_config


def test_warmup_multistep_lr():
    # linear warmup over 5 iters from factor 1/3, then x0.1 at milestones
    lrs = [warmup_multistep_lr(0.01, i, (10, 20), gamma=0.1,
                               warmup_iters=5) for i in range(25)]
    assert abs(lrs[0] - 0.01 / 3) < 1e-12
    assert abs(lrs[5] - 0.01) < 1e-12
    assert abs(lrs[10] - 0.001) < 1e-12
    assert abs(lrs[20] - 0.0001) < 1e-12


def test_lr_multiplier_tree():
    params = {'features': {'stem_conv': {'kernel': np.zeros(1)},
                           'layer1_0': {'kernel': np.zeros(1)}},
              'fc1': {'kernel': np.zeros(1)}}
    mult = lr_multiplier_tree(params, backbone_lr=1e-5, fc_lr=5e-5)
    assert mult['features']['stem_conv']['kernel'] == 0.0
    assert mult['features']['layer1_0']['kernel'] == 1e-5
    assert mult['fc1']['kernel'] == 5e-5


def test_tsp_train_step_runs():
    opt = load_config(backbone_tsp='r3d_18', tsp_num_classes=(3, 2),
                      tsp_num_heads=2, loss_alphas=[1.0, 0.5],
                      backbone_lr=1e-4, fc_lr=1e-3)
    trainer = TSPTrainer(opt)
    rng = np.random.default_rng(0)
    batch = {
        'clip': jnp.asarray(rng.standard_normal(
            (2, 4, 32, 32, 3)).astype(np.float32)),
        'label0': jnp.asarray([1, -1]),
        'label1': jnp.asarray([0, 1]),
    }
    state = trainer.init_state(batch)
    p0 = jax.tree_util.tree_leaves(state['variables']['params'])
    state, metrics = trainer.train_step(state, batch, iteration=0)
    assert np.isfinite(float(metrics['total']))
    p1 = jax.tree_util.tree_leaves(state['variables']['params'])
    # fc params moved, stem params frozen
    flat0 = jax.tree_util.tree_flatten_with_path(
        state['variables']['params'])[0]
    moved = frozen = False
    import dvc_tpu.train.tsp_trainer as tt
    state0_params = None
    # re-init to compare against starting values
    trainer2 = TSPTrainer(opt)
    init_params = trainer2.init_state(batch)['variables']['params']
    flat_init = dict(jax.tree_util.tree_flatten_with_path(init_params)[0])
    for path, val in flat0:
        ps = '/'.join(str(p) for p in path)
        diff = np.abs(np.asarray(val) - np.asarray(flat_init[path])).sum()
        if 'stem' in ps:
            frozen = frozen or diff == 0
        if 'fc1' in ps and 'kernel' in ps:
            moved = moved or diff > 0
    assert moved and frozen


def test_tsp_train_step_with_gvf():
    opt = load_config(backbone_tsp='r3d_18', tsp_num_classes=(3, 2),
                      tsp_num_heads=2, loss_alphas=[1.0, 0.5],
                      backbone_lr=1e-4, fc_lr=1e-3,
                      global_video_features='dummy.h5')
    trainer = TSPTrainer(opt)
    rng = np.random.default_rng(0)
    batch = {
        'clip': jnp.asarray(rng.standard_normal(
            (2, 4, 32, 32, 3)).astype(np.float32)),
        'gvf': jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32)),
        'label0': jnp.asarray([1, 0]),
        'label1': jnp.asarray([0, 1]),
    }
    state = trainer.init_state(batch)
    state, metrics = trainer.train_step(state, batch, iteration=0)
    assert np.isfinite(float(metrics['total']))
