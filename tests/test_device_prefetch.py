"""DevicePrefetchLoader (HBM double-buffering) is a pure reordering:
identical losses/params to feeding train_step raw host batches."""
import jax
import numpy as np
import pytest

from dvc_tpu.data.prefetch import DevicePrefetchLoader
from dvc_tpu.train import Trainer
from test_model import make_batch, tiny_opt


def _batches(n=3):
    return [({k: np.asarray(v) for k, v in make_batch(
        np.random.default_rng(i)).items()}, {'i': i}) for i in range(n)]


@pytest.mark.heavy
def test_device_prefetch_matches_plain_path():
    opt = tiny_opt(msda_impl='ref', drop_prob=0.0,
                   transformer_dropout_prob=0.0)
    items = _batches()

    def run(use_prefetch):
        t = Trainer(opt)
        s = t.init_state(items[0][0], seed=0)
        rng = jax.random.PRNGKey(7)
        loader = (DevicePrefetchLoader(items, t.prepare_batch)
                  if use_prefetch else items)
        out = []
        metas = []
        for batch, meta in loader:
            rng, r = jax.random.split(rng)
            s, losses = t.train_step(s, batch, 1e-4, 0.0, r)
            out.append(float(losses['total_loss']))
            metas.append(meta['i'])
        return out, metas, s

    want, order_want, s1 = run(False)
    got, order_got, s2 = run(True)
    assert order_got == order_want            # metas stay batch-aligned
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(s1['params']),
                    jax.tree_util.tree_leaves(s2['params'])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-6)


def test_early_exit_reaps_prefetch_worker():
    """Abandoning the loader mid-epoch (debug-mode break, eval exception)
    must not leave the prefetch worker parked in q.put forever."""
    import threading

    from dvc_tpu.data.prefetch import PrefetchLoader

    items = [({'x': np.zeros(4)}, {'i': i}) for i in range(50)]
    before = threading.active_count()
    for _ in range(5):
        for j, item in enumerate(PrefetchLoader(items)):
            if j == 1:
                break                     # abandon the generator
    import gc
    gc.collect()                          # finalize abandoned generators
    deadline = 50
    while threading.active_count() > before and deadline:
        deadline -= 1
        import time
        time.sleep(0.1)
    assert threading.active_count() <= before


def test_prefetch_propagates_loader_errors():
    from dvc_tpu.data.prefetch import PrefetchLoader

    def bad():
        yield ({'x': 1}, {})
        raise RuntimeError('boom')

    with pytest.raises(RuntimeError, match='boom'):
        list(PrefetchLoader(bad()))


@pytest.mark.heavy
def test_eval_step_prepared_matches_raw():
    opt = tiny_opt(msda_impl='ref', drop_prob=0.0,
                   transformer_dropout_prob=0.0)
    (b0, _), = _batches(1)
    t = Trainer(opt)
    s = t.init_state(b0, seed=0)
    out_raw, losses_raw = t.eval_step(s, b0)
    out_pre, losses_pre = t.eval_step(s, t.prepare_eval_batch(dict(b0)))
    for k in losses_raw:
        np.testing.assert_allclose(float(losses_pre[k]),
                                   float(losses_raw[k]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_pre['pred_boxes']),
                               np.asarray(out_raw['pred_boxes']), rtol=1e-6)


def test_prepared_batches_skip_reprep():
    opt = tiny_opt(msda_impl='ref')
    (b0, _), = _batches(1)
    t = Trainer(opt)
    prepared = t.prepare_batch(dict(b0))
    assert prepared.pop('_prepared') is True
    # bucketing happened (caption axis trimmed to a multiple of 8) and the
    # leaves are committed device arrays
    assert prepared['cap_tensor'].shape[-1] <= b0['cap_tensor'].shape[-1]
    assert all(isinstance(v, jax.Array) for v in prepared.values())
