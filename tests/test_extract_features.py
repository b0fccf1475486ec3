"""extract_features.py driver end-to-end on a synthesized video (tiny
backbone shapes keep this CPU-feasible)."""
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy

cv2 = pytest.importorskip('cv2')

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_extract_features_driver(tmp_path):
    vid_dir = tmp_path / 'videos'
    vid_dir.mkdir()
    path = str(vid_dir / 'v_extract0001.mp4')
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), 30.0,
                        (64, 48))
    for i in range(120):
        w.write(np.full((48, 64, 3), i % 255, np.uint8))
    w.release()

    out_dir = tmp_path / 'features'
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = env.get('JAX_PLATFORMS', '')
    cmd = [sys.executable, os.path.join(ROOT, 'extract_features.py'),
           '--video-dir', str(vid_dir), '--backbone', 'r3d_18',
           '--clip-len', '4', '--frame-rate', '15', '--stride', '16',
           '--batch-size', '2', '--output-dir', str(out_dir),
           '--dtype', 'float32']
    # run in-process on the CPU backend instead of subprocess (jax is
    # already configured for CPU by conftest)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'extract_features_mod', os.path.join(ROOT, 'extract_features.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old_argv = sys.argv
    try:
        sys.argv = cmd[1:]
        mod.main()
    finally:
        sys.argv = old_argv

    out = out_dir / 'v_extract0001.npy'
    assert out.exists()
    feats = np.load(out)
    assert feats.shape[1] == 512
    assert feats.shape[0] >= 2
    assert np.isfinite(feats).all()

    # idempotency: second run skips
    try:
        sys.argv = cmd[1:]
        mod.main()
    finally:
        sys.argv = old_argv
