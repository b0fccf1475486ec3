#!/usr/bin/env python
"""Video download helper (reference ``trainvid_download.py`` /
``recheckvids.py``): fetch YouTube videos named in a caption annotation
file via yt-dlp and record the ids that fail as an invalid-video list.

Requires network access and the yt-dlp binary (not bundled).
"""
import argparse
import json
import os
import shutil
import subprocess

if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--anno', required=True)
    p.add_argument('--out-dir', required=True)
    p.add_argument('--invalid-out', default='invalidVids.json')
    args = p.parse_args()

    if shutil.which('yt-dlp') is None:
        raise SystemExit('yt-dlp not found on PATH')
    with open(args.anno) as f:
        keys = list(json.load(f).keys())
    os.makedirs(args.out_dir, exist_ok=True)
    invalid = []
    for k in keys:
        ytid = k[2:13] if k.startswith('v_') else k[:11]
        out = os.path.join(args.out_dir, f'{k[:13]}.mp4')
        if os.path.exists(out):
            continue
        r = subprocess.run(['yt-dlp', '-f', 'mp4', '-o', out,
                            f'https://www.youtube.com/watch?v={ytid}'])
        if r.returncode != 0:
            invalid.append(k[:13])
    with open(args.invalid_out, 'w') as f:
        json.dump(invalid, f)
    print(f'{len(invalid)} unavailable -> {args.invalid_out}')
