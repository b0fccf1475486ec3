#!/usr/bin/env python
"""Dataset sanity checks (reference ``data/checkData.py`` /
``data/yc2/checkValidVideos.py``): event-count statistics and
missing-feature detection; writes an invalid-video list usable as
``invalid_video_json``.

    python tools/check_data.py --anno yc2_train.json \
        --feature-folder data/yc2/features/tsp_mvitv2 --feature-type tsp_mvit
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvc_tpu.data import FEATURE_SPECS

if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--anno', required=True)
    p.add_argument('--feature-folder', default=None)
    p.add_argument('--feature-type', default='tsp_mvit')
    p.add_argument('--out-invalid', default=None)
    args = p.parse_args()

    with open(args.anno) as f:
        anno = json.load(f)
    counts = [len(v['timestamps']) for v in anno.values()]
    print(f'videos: {len(anno)}')
    print(f'events/video: min {min(counts)} max {max(counts)} '
          f'mean {sum(counts) / len(counts):.2f}')

    if args.feature_folder:
        spec = FEATURE_SPECS[args.feature_type]
        invalid = []
        for k in anno:
            if not os.path.exists(spec['path'](args.feature_folder, k)):
                invalid.append(k[:13])
        print(f'missing features: {len(invalid)}')
        if args.out_invalid:
            with open(args.out_invalid, 'w') as f:
                json.dump(invalid, f)
            print(f'-> {args.out_invalid}')
