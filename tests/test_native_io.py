"""Native C++ feature-IO library vs numpy reference."""
import os
import subprocess

import numpy as np
import pytest

from dvc_tpu.data import native_io

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope='module', autouse=True)
def built_lib():
    if not native_io.available():
        subprocess.run(['make', '-C', os.path.join(ROOT, 'native')],
                       check=True, capture_output=True)
        native_io._TRIED = False
        native_io._LIB = None
    assert native_io.available(), 'native library must build'


def test_load_npy_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for dtype in (np.float32, np.float64):
        x = rng.standard_normal((17, 5)).astype(dtype)
        p = tmp_path / f'x_{dtype.__name__}.npy'
        np.save(p, x)
        got = native_io.load_npy(str(p))
        np.testing.assert_allclose(got, x.astype(np.float32), rtol=1e-6)


def test_resize_matches_numpy():
    from dvc_tpu.data.dataset import resize_feature
    rng = np.random.default_rng(1)
    x = rng.standard_normal((37, 8)).astype(np.float32)
    for method in ('nearest', 'linear'):
        native = native_io.resize_feature(x, 100, method)
        # numpy path (bypass the native fast path)
        orig = len(x)
        x_new = np.arange(100) * (orig - 1) / 99.0
        if method == 'nearest':
            idx = np.clip(np.round(x_new).astype(np.int64), 0, orig - 1)
            ref = x[idx]
        else:
            lo = np.clip(np.floor(x_new).astype(np.int64), 0, orig - 1)
            hi = np.clip(lo + 1, 0, orig - 1)
            w = (x_new - lo)[:, None].astype(np.float32)
            ref = x[lo] * (1 - w) + x[hi] * w
        np.testing.assert_allclose(native, ref, rtol=1e-5, atol=1e-6)


def test_load_batch_parallel(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    refs = []
    for i in range(6):
        x = rng.standard_normal((10 + i, 4)).astype(np.float32)
        p = tmp_path / f'v{i}.npy'
        np.save(p, x)
        paths.append(str(p))
        refs.append(x)
    paths.append(str(tmp_path / 'missing.npy'))
    out, mask, lengths = native_io.load_batch(paths, T=20, C=4)
    assert out.shape == (7, 20, 4)
    assert lengths[-1] == 0 and not mask[-1].any()
    assert np.allclose(out[-1], 0)
    for i in range(6):
        assert lengths[i] == 10 + i
        assert mask[i].all()
        np.testing.assert_allclose(out[i, 0], refs[i][0], rtol=1e-6)
        np.testing.assert_allclose(out[i, -1], refs[i][-1], rtol=1e-6)
