"""The turnkey dp-scaling kit runs end-to-end on the virtual mesh.

``tools/bench_scaling.py`` is the script a future real-multichip session
runs as-is; here its full plumbing (mesh construction per sweep point,
per-chip batch scaling, in-graph timing loop, efficiency/psum summary) is
driven on the 8-virtual-CPU-device mesh.  The timing numbers are
meaningless on CPU — the shape of the output and the mesh execution are
what this pins.
"""
import os
import sys

import pytest

pytestmark = pytest.mark.heavy

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_scaling_virtual_sweep():
    sys.path.insert(0, os.path.join(ROOT, 'tools'))
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'bench_scaling_mod', os.path.join(ROOT, 'tools', 'bench_scaling.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    summary = mod.main(['--virtual', '8', '--chips', '1', '2', '4',
                        '--batch-per-chip', '2', '--n1', '1', '--n2', '3',
                        '--model', 'pdvc'])
    rows = summary['rows']
    assert [r['chips'] for r in rows] == [1, 2, 4]
    for r in rows:
        assert r['batch_global'] == 2 * r['chips']
        assert r['step_ms'] > 0
        assert r['videos_per_sec'] > 0
        assert 'scaling_efficiency' in r and 'psum_overhead_ms' in r
    assert rows[0]['scaling_efficiency'] == 1.0
    assert summary['platform'] == 'cpu' and summary['virtual']


def test_bench_scaling_fusion_point():
    """One fusion-model sweep point (the default --model) compiles and
    steps under a 2-device mesh."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'bench_scaling_mod2',
        os.path.join(ROOT, 'tools', 'bench_scaling.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    summary = mod.main(['--virtual', '8', '--chips', '2',
                        '--batch-per-chip', '2', '--n1', '1', '--n2', '2',
                        '--model', 'fusion'])
    assert summary['rows'][0]['chips'] == 2
    assert summary['model'] == 'fusion'
