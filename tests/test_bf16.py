"""Mixed-precision (bf16 trunk) numerics: same params, loss close to f32."""
import jax
import numpy as np

from dvc_tpu.models import PDVC, PDVCConfig, build_weight_dict
from test_model import make_batch, tiny_opt
import pytest

pytestmark = pytest.mark.heavy


def test_bf16_loss_close_to_f32():
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    losses = {}
    params32 = None
    for dt in ('float32', 'bfloat16'):
        opt = tiny_opt(tpu_compute_dtype=dt)
        model = PDVC(PDVCConfig.from_opt(opt))
        if params32 is None:
            params32 = model.init({'params': jax.random.PRNGKey(0)},
                                  batch, eval_mode=True)
        out, l = model.apply(params32, batch, eval_mode=True)
        wd = build_weight_dict(opt)
        losses[dt] = sum(float(l[k]) * w for k, w in wd.items() if k in l)
        assert np.isfinite(losses[dt])
    rel = abs(losses['bfloat16'] - losses['float32']) / abs(losses['float32'])
    assert rel < 0.05, losses
