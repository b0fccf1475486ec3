#!/usr/bin/env python
"""Merge per-video .npy features into one h5 archive — e.g. to build the
global-video-feature (GVF) table for TSP's second head (reference
``merge_pkl_files_into_one_h5_feature_file.py``, inverted direction of
``tools/convert_h5_features.py``).

    python tools/merge_features_to_h5.py --features-dir feats/ \
        --out gvf.h5 --pool mean
"""
import argparse
import glob
import os

if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--features-dir', required=True)
    p.add_argument('--out', required=True)
    p.add_argument('--pool', choices=['none', 'mean', 'max'], default='none',
                   help="'mean'/'max' collapse the time axis (GVF use case)")
    args = p.parse_args()

    import h5py
    import numpy as np
    n = 0
    with h5py.File(args.out, 'w') as f:
        for path in sorted(glob.glob(os.path.join(args.features_dir,
                                                  '*.npy'))):
            vid = os.path.splitext(os.path.basename(path))[0]
            x = np.load(path)
            if args.pool == 'mean' and x.ndim == 2:
                x = x.mean(0)
            elif args.pool == 'max' and x.ndim == 2:
                x = x.max(0)
            f.create_dataset(vid, data=x)
            n += 1
    print(f'{n} videos -> {args.out}')
