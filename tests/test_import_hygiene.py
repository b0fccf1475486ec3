"""Importing the library must never initialize a JAX backend.

On this deployment the TPU is reached through a tunnel: backend init costs
a 30s+ handshake and hangs indefinitely when the tunnel is down — and it
holds the GIL, so even watchdog threads can't recover.  A module-level
``jnp.asarray(...)``/``jnp.float32(...)`` constant is enough to trigger it
(regression: ``ops/assignment.py`` once held ``jnp.float32(inf)``).  This
test imports every library entry point in a clean subprocess with the
production platform config and asserts no backend came up.
"""
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CODE = """
import jax
import dvc_tpu
import dvc_tpu.models
import dvc_tpu.models.fusion
import dvc_tpu.models.pdvc_converter
import dvc_tpu.models.tsp
import dvc_tpu.ops
import dvc_tpu.ops.assignment
import dvc_tpu.ops.dsa_step
import dvc_tpu.data.dataset
import dvc_tpu.data.fusion_dataset
import dvc_tpu.data.prefetch
import dvc_tpu.train.trainer
import dvc_tpu.train.tsp_trainer
import dvc_tpu.eval.eval_utils
import dvc_tpu.parallel.mesh
import dvc_tpu.parallel.op_partition
import dvc_tpu.utils.config
from jax._src import xla_bridge
assert not xla_bridge._backends, (
    'importing dvc_tpu initialized backend(s): '
    + repr(list(xla_bridge._backends)))
print('CLEAN')
"""


def test_library_imports_do_not_initialize_backend():
    if not hasattr(__import__('jax._src.xla_bridge', fromlist=['x']),
                   '_backends'):
        pytest.skip('jax internals moved; update the probe')
    # run with the inherited (production) env — if an import-time array
    # sneaks in, this would try to bring up the real backend, so a timeout
    # is itself a failure
    try:
        out = subprocess.run(
            [sys.executable, '-c', _CODE], timeout=240,
            capture_output=True, text=True, cwd=_REPO)
    except subprocess.TimeoutExpired:
        raise AssertionError(
            'import hung — something initializes the (tunneled) backend '
            'at import time')
    assert out.returncode == 0 and 'CLEAN' in out.stdout, (
        out.stdout + out.stderr)
