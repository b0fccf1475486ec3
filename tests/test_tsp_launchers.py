"""The TSP/TAC launch recipes drive train_tsp.py end-to-end.

Reference launchers: ``video_backbone/TSP/train/train_{tsp,tac}_on_*.sh``
(torch.distributed.launch + NCCL); here the same hyperparameter surface
feeds the pjit data-mesh trainer.  A tiny synthesized video + groundtruth
CSV keeps this CPU-feasible (heavy lane).
"""
import csv
import importlib.util
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy

cv2 = pytest.importorskip('cv2')

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(ROOT, 'scripts')


def _write_video(path, n_frames=80):
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*'mp4v'), 30.0,
                        (64, 48))
    for i in range(n_frames):
        w.write(np.full((48, 64, 3), (7 * i) % 255, np.uint8))
    w.release()


def _write_gt_csv(path, videos, two_heads=True):
    cols = ['filename', 't-start', 't-end', 'action-label']
    if two_heads:
        cols.append('temporal-region-label')
    with open(path, 'w', newline='') as f:
        wr = csv.DictWriter(f, fieldnames=cols)
        wr.writeheader()
        for i, v in enumerate(videos):
            for t in (0.0, 1.0):
                row = {'filename': v, 't-start': t, 't-end': t + 1.0,
                       'action-label': i % 2}
                if two_heads:
                    row['temporal-region-label'] = (i + 1) % 2
                wr.writerow(row)


def _run_train_tsp(argv):
    spec = importlib.util.spec_from_file_location(
        'train_tsp_mod', os.path.join(ROOT, 'train_tsp.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    try:
        sys.argv = ['train_tsp.py'] + argv
        mod.main()
    finally:
        sys.argv = old


@pytest.mark.parametrize('two_heads', [True, False],
                         ids=['tsp-two-heads', 'tac-single-head'])
def test_train_tsp_driver_from_launcher_args(tmp_path, two_heads):
    vid_dir = tmp_path / 'videos'
    vid_dir.mkdir()
    vids = []
    for i in range(2):
        p = vid_dir / f'v_tsp{i:07d}.mp4'
        _write_video(p)
        vids.append(str(p))
    gt = tmp_path / 'gt.csv'
    _write_gt_csv(gt, vids, two_heads)
    out = tmp_path / 'out'

    label_cols = (['action-label', 'temporal-region-label'] if two_heads
                  else ['action-label'])
    alphas = ['1.0'] * len(label_cols)
    # the launchers' hyperparameter surface, shrunk to CPU-feasible shapes
    _run_train_tsp(['--train-csv', str(gt),
                    '--label-columns'] + label_cols +
                   ['--loss-alphas'] + alphas +
                   ['--backbone', 'r3d_18',
                    '--clip-len', '4',
                    '--clips-per-segment', '1',
                    '--batch-size', '2',
                    '--epochs', '1',
                    '--backbone-lr', '0.0001',
                    '--fc-lr', '0.002',
                    '--output-dir', str(out)])
    assert (out / 'tsp-last.ckpt').exists()


def test_train_tsp_val_best_ckpt_and_resume(tmp_path):
    """The reference regime end to end (train/train.py:89-117,329-335):
    jittered clips-per-segment training, per-epoch validation with
    accuracy meters, val-driven best checkpoint, then mid-run resume."""
    import json as _json
    import pickle
    vid_dir = tmp_path / 'videos'
    vid_dir.mkdir()
    vids = []
    for i in range(2):
        p = vid_dir / f'v_tsp{i:07d}.mp4'
        _write_video(p)
        vids.append(str(p))
    gt = tmp_path / 'gt.csv'
    _write_gt_csv(gt, vids)
    out = tmp_path / 'out'

    common = ['--train-csv', str(gt), '--valid-csv', str(gt),
              '--backbone', 'r3d_18', '--clip-len', '4',
              '--clips-per-segment', '2', '--batch-size', '2',
              '--backbone-lr', '0.0001', '--fc-lr', '0.002',
              '--output-dir', str(out)]
    _run_train_tsp(common + ['--epochs', '1'])
    assert (out / 'tsp-last.ckpt').exists()
    assert (out / 'tsp-best.ckpt').exists()   # val ran, best selected
    results = (out / 'results.txt').read_text()
    assert 'Valid Epoch 0' in results and 'Avg Accuracy' in results
    recs = [_json.loads(l) for l in
            (out / 'metrics.jsonl').read_text().splitlines()]
    assert 'valid_avg_accuracy' in recs[-1]
    with open(out / 'tsp-last.ckpt', 'rb') as f:
        ck = pickle.load(f)
    assert ck['epoch'] == 0 and ck['iteration'] > 0
    assert 'opt_state' in ck

    # resume continues into epoch 1 with the saved optimizer state
    _run_train_tsp(common + ['--epochs', '2', '--resume',
                             str(out / 'tsp-last.ckpt')])
    with open(out / 'tsp-last.ckpt', 'rb') as f:
        ck2 = pickle.load(f)
    assert ck2['epoch'] == 1
    assert ck2['iteration'] > ck['iteration']
    assert 'Valid Epoch 1' in (out / 'results.txt').read_text()

    # --valid-only evaluates without training (reference train.py:338-343)
    _run_train_tsp(common + ['--epochs', '2', '--valid-only',
                             '--resume', str(out / 'tsp-last.ckpt')])


def test_launcher_shells_present_and_valid():
    expected = [
        'train_tsp_on_yc2.sh', 'train_tsp_on_activitynet.sh',
        'train_tsp_on_thumos14.sh', 'train_tac_on_activitynet.sh',
        'train_tac_on_thumos14.sh',
        'extract_features_from_a_released_checkpoint.sh',
        'standardize_videos_to_constant_30fps_mp4.sh',
    ]
    for name in expected:
        path = os.path.join(SCRIPTS, name)
        assert os.path.exists(path), name
        assert os.access(path, os.X_OK), f'{name} not executable'
        subprocess.run(['bash', '-n', path], check=True)
