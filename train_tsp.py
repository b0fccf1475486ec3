#!/usr/bin/env python
"""TSP backbone pretraining driver.

Reference: ``video_backbone/TSP/train/train.py`` + the
``train/train_tsp_on_{activitynet,thumos14,yc2}.sh`` launchers.  Clips and
labels come from a groundtruth CSV (columns: filename, t-start, t-end,
action-label[, temporal-region-label]); the loop is the TPU-native DDP
equivalent (see ``dvc_tpu/train/tsp_trainer.py``).

    python train_tsp.py --train-csv yc2_train_tsp_groundtruth.csv \
        --backbone mvit_v2_s --epochs 8 --batch-size 32
"""

import argparse
import csv
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--train-csv', type=str, required=True)
    p.add_argument('--backbone', type=str, default='mvit_v2_s')
    p.add_argument('--clip-len', type=int, default=16)
    p.add_argument('--frame-rate', type=float, default=15)
    p.add_argument('--batch-size', type=int, default=32)
    p.add_argument('--epochs', type=int, default=8)
    p.add_argument('--backbone-lr', type=float, default=1e-5)
    p.add_argument('--fc-lr', type=float, default=5e-5)
    p.add_argument('--lr-milestones', type=int, nargs='+', default=[4, 6])
    p.add_argument('--lr-gamma', type=float, default=0.1)
    p.add_argument('--lr-warmup-epochs', type=int, default=2)
    p.add_argument('--weight-decay', type=float, default=0.005)
    p.add_argument('--train-bn', type=int, default=0,
                   help='update BN running stats (SyncBN-equivalent '
                        'across the data mesh)')
    p.add_argument('--label-columns', type=str, nargs='+',
                   default=['action-label', 'temporal-region-label'])
    p.add_argument('--loss-alphas', type=float, nargs='+', default=[1.0, 1.0])
    p.add_argument('--global-video-features', type=str, default=None,
                   help='h5 of per-video global features for the second '
                        'head (reference TSP GVF, model.py:39-40)')
    p.add_argument('--output-dir', type=str, default='save/tsp')
    p.add_argument('--mesh-data', type=int, default=1)
    p.add_argument('--seed', type=int, default=777)
    return p.parse_args()


def load_clip_rows(path, label_columns):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    clips = []
    for r in rows:
        labels = [int(float(r.get(c, -1) or -1)) for c in label_columns]
        clips.append(dict(filename=r['filename'],
                          t_start=float(r.get('t-start',
                                              r.get('clip-t-start', 0))),
                          labels=labels))
    return clips


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from dvc_tpu.data.video_clips import BACKBONE_INPUT, decode_clip
    from dvc_tpu.train.tsp_trainer import TSPTrainer, warmup_multistep_lr
    from dvc_tpu.train.trainer import enable_compilation_cache
    from dvc_tpu.utils.config import load_config

    enable_compilation_cache()
    os.makedirs(args.output_dir, exist_ok=True)
    clips = load_clip_rows(args.train_csv, args.label_columns)
    n_heads = len(args.label_columns)
    n_classes = tuple(
        max(max((c['labels'][i] for c in clips), default=0) + 1, 2)
        for i in range(n_heads))
    print(f'{len(clips)} clips, heads {n_heads}, classes {n_classes}')

    gvf_table = {}
    if args.global_video_features:
        import h5py
        with h5py.File(args.global_video_features, 'r') as f:
            gvf_table = {k: np.asarray(f[k]) for k in f.keys()}
        print(f'loaded {len(gvf_table)} global video features')

    opt = load_config(backbone_tsp=args.backbone,
                      tsp_num_classes=n_classes, tsp_num_heads=n_heads,
                      loss_alphas=args.loss_alphas,
                      backbone_lr=args.backbone_lr, fc_lr=args.fc_lr,
                      global_video_features=args.global_video_features,
                      tsp_weight_decay=args.weight_decay,
                      tsp_train_bn=args.train_bn,
                      tpu_mesh_data=args.mesh_data)
    steps_per_epoch = max(len(clips) // args.batch_size, 1)
    opt.lr_milestones = tuple(m * steps_per_epoch
                              for m in args.lr_milestones)
    opt.lr_gamma = args.lr_gamma
    opt.lr_warmup_iters = args.lr_warmup_epochs * steps_per_epoch

    trainer = TSPTrainer(opt)
    spec = BACKBONE_INPUT[args.backbone]
    rng = np.random.default_rng(args.seed)

    def make_batch(chunk):
        xs = [decode_clip(c['filename'], c['t_start'], args.clip_len,
                          args.frame_rate, spec['resize'], spec['crop'],
                          flip=bool(rng.integers(2))) for c in chunk]
        while len(xs) < args.batch_size:
            xs.append(np.zeros_like(xs[0]))
        batch = {'clip': jnp.asarray(np.stack(xs))}
        if gvf_table:
            def vid_key(c):
                return os.path.splitext(
                    os.path.basename(c['filename']))[0][:13]
            dim = next(iter(gvf_table.values())).shape[-1]
            gvf = [gvf_table.get(vid_key(c), np.zeros(dim, np.float32))
                   for c in chunk]
            gvf += [np.zeros(dim, np.float32)] * (args.batch_size - len(chunk))
            batch['gvf'] = jnp.asarray(np.stack(gvf).astype(np.float32))
        for i in range(n_heads):
            labels = [c['labels'][i] for c in chunk]
            labels += [-1] * (args.batch_size - len(chunk))
            batch[f'label{i}'] = jnp.asarray(labels)
        return batch

    state = trainer.init_state(make_batch(clips[:args.batch_size]),
                               seed=args.seed)
    it = 0
    for epoch in range(args.epochs):
        order = rng.permutation(len(clips))
        t0 = time.time()
        sums = {}
        nb = 0
        def batches(order=order):
            for i in range(0, len(order) - args.batch_size + 1,
                           args.batch_size):
                chunk = [clips[j] for j in order[i:i + args.batch_size]]
                yield make_batch(chunk), None

        from dvc_tpu.data.prefetch import PrefetchLoader
        for batch, _ in PrefetchLoader(batches()):
            state, metrics = trainer.train_step(state, batch, it)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            it += 1
            nb += 1
        dt = time.time() - t0
        avg = {k: round(v / max(nb, 1), 4) for k, v in sums.items()}
        cps = nb * args.batch_size / max(dt, 1e-9)
        print(f'epoch {epoch}: {avg} ({cps:.1f} clips/s)')
        with open(os.path.join(args.output_dir, 'tsp-last.ckpt'), 'wb') as f:
            pickle.dump({'variables': jax.tree_util.tree_map(
                np.asarray, state['variables']), 'epoch': epoch}, f)
    print('done')


if __name__ == '__main__':
    main()
