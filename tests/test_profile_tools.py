"""Host-side logic of the profiling tools (the capture side needs the real
chip; the trace parsing is pure and testable)."""
import gzip
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.profile_step import summarize  # noqa: E402


def _write_trace(dirpath, events):
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, 'vm.trace.json.gz')
    with gzip.open(path, 'wt') as f:
        json.dump({'traceEvents': events}, f)
    return path


def test_summarize_filters_to_device_plane(tmp_path):
    events = [
        {'ph': 'M', 'name': 'process_name', 'pid': 1,
         'args': {'name': '/device:TPU:0'}},
        {'ph': 'M', 'name': 'process_name', 'pid': 2,
         'args': {'name': '/host:CPU'}},
        # device ops: two calls of the same fusion + one big while
        {'ph': 'X', 'pid': 1, 'name': 'fusion.1', 'dur': 1000},
        {'ph': 'X', 'pid': 1, 'name': 'fusion.1', 'dur': 500},
        {'ph': 'X', 'pid': 1, 'name': 'while.9', 'dur': 9000},
        # host noise that must NOT appear
        {'ph': 'X', 'pid': 2, 'name': 'hostcall', 'dur': 99999},
    ]
    _write_trace(str(tmp_path), events)
    s = summarize(str(tmp_path), top=10)
    assert s['device_plane'] is True
    names = [o['name'] for o in s['top_ops_ms']]
    assert names[0] == 'while.9'
    assert 'hostcall' not in names
    fusion = next(o for o in s['top_ops_ms'] if o['name'] == 'fusion.1')
    assert fusion['count'] == 2
    assert abs(fusion['total_ms'] - 1.5) < 1e-9


def test_summarize_no_device_plane(tmp_path):
    events = [
        {'ph': 'M', 'name': 'process_name', 'pid': 2,
         'args': {'name': 'python-main'}},
        {'ph': 'X', 'pid': 2, 'name': 'hostcall', 'dur': 100},
    ]
    _write_trace(str(tmp_path), events)
    s = summarize(str(tmp_path), top=10)
    assert s['device_plane'] is False
    # without a device plane everything is reported rather than dropped
    assert s['top_ops_ms'][0]['name'] == 'hostcall'


def test_summarize_missing_trace(tmp_path):
    s = summarize(str(tmp_path), top=5)
    assert s['device_plane'] is False
    assert 'note' in s
