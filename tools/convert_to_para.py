#!/usr/bin/env python
"""Join per-event sentences into paragraph ground truth
(reference ``data/yc2/captiondata/para/convert_to_para.py``).

    python tools/convert_to_para.py --anno yc2_val.json --out para_yc2_val.json
"""
import argparse
import json

if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--anno', required=True)
    p.add_argument('--out', required=True)
    args = p.parse_args()
    with open(args.anno) as f:
        d = json.load(f)
    out = {k: '. '.join(v['sentences']) for k, v in d.items()}
    with open(args.out, 'w') as f:
        json.dump(out, f)
    print(f'{len(out)} paragraphs -> {args.out}')
