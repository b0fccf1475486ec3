#!/usr/bin/env python
"""h5 feature archives -> per-video .npy files
(reference ``data/anet/features/convert_{c3d,tsp}_h5_to_npy.py`` and
``merge_pkl_files_into_one_h5_feature_file.py``, inverted).

    python tools/convert_h5_features.py --h5 sub_activitynet_v1-3.c3d.hdf5 \
        --key c3d_features --out data/anet/features/c3d
"""
import argparse
import os

if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--h5', required=True)
    p.add_argument('--key', default=None,
                   help='inner dataset key per video (e.g. c3d_features); '
                        'omit when the h5 maps video -> array directly')
    p.add_argument('--out', required=True)
    p.add_argument('--prefix', default='',
                   help="prepend to each video id (the reference's TSP "
                        "converter adds 'v_' to bare YouTube ids)")
    args = p.parse_args()

    import h5py
    import numpy as np
    os.makedirs(args.out, exist_ok=True)
    n = 0
    with h5py.File(args.h5, 'r') as f:
        for vid in f.keys():
            arr = f[vid][args.key] if args.key else f[vid]
            name = (args.prefix + vid)[:13]
            np.save(os.path.join(args.out, name + '.npy'),
                    np.asarray(arr))
            n += 1
    print(f'{n} videos -> {args.out}')
