#!/usr/bin/env python
"""One-command materialization of everything BASELINE.md needs.

The reference ships per-feature-set ``download_*.sh`` scripts
(``/root/reference/data/anet/features/download_c3d_features.sh`` etc.) and
keeps the caption/vocabulary JSONs in-tree; the METEOR jar + PTBTokenizer
jar are unshipped external artifacts
(``densevid_eval3/pycocoevalcap/meteor/meteor.py:12-24``,
``tokenizer/ptbtokenizer.py:17-18``).  This tool replaces all of that with
one declarative, idempotent, resumable entry point:

    python tools/fetch_artifacts.py --list
    python tools/fetch_artifacts.py --only yc2_captions,yc2_tsn
    python tools/fetch_artifacts.py --all [--dest data] [--dry-run]
    python tools/fetch_artifacts.py --only meteor --calibrate

Behavior:
* zero-egress environments are detected up front (a 5s probe); downloads
  are skipped with a clear per-artifact report instead of a stack trace.
* caption annotations / vocabularies / invalid-video lists are plain data
  files that also live in a local reference checkout; when
  ``--reference-root`` (default ``/root/reference``) exists they are
  copied from there without touching the network.
* every step is skipped when its output already exists (re-run after a
  partial failure and it continues where it stopped).
* ``--only meteor --calibrate`` chains straight into
  ``tools/calibrate_meteor.py`` so the Python METEOR's divergence from the
  jar becomes a measured number the moment the jar is fetchable.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import shutil
import subprocess
import sys
import tarfile
import urllib.request
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

YC2_DENSECAP = 'http://youcook2.eecs.umich.edu/static/dat/yc2_densecap'
ANET_DENSECAP = 'http://youcook2.eecs.umich.edu/static/dat/anet_densecap'
ANET_C3D = ('http://ec2-52-25-205-214.us-west-2.compute.amazonaws.com'
            '/data/challenge16/features/c3d')
TSP_REL = 'https://github.com/HumamAlwassel/TSP/releases/download'

# released TSP/TAC model weights (reference
# video_backbone/TSP/extract_features/extract_features.py:31-50) —
# extract_features.py --released-checkpoint resolves names through this
_W = f'{TSP_REL}/model_weights'
RELEASED_TSP_CHECKPOINTS = {
    'r2plus1d_34-tsp_on_activitynet':
        f'{_W}/r2plus1d_34-tsp_on_activitynet-max_gvf-backbone_lr_0.0001'
        '-fc_lr_0.002-epoch_5-0d2cf854.pth',
    'r2plus1d_34-tsp_on_thumos14':
        f'{_W}/r2plus1d_34-tsp_on_thumos14-max_gvf-backbone_lr_0.0001'
        '-fc_lr_0.004-epoch_4-e6a30b2f.pth',
    'r2plus1d_34-tac_on_activitynet':
        f'{_W}/r2plus1d_34-tac_on_activitynet-backbone_lr_0.0001'
        '-fc_lr_0.002-epoch_5-98ccac94.pth',
    'r2plus1d_34-tac_on_thumos14':
        f'{_W}/r2plus1d_34-tac_on_thumos14-backbone_lr_0.00001'
        '-fc_lr_0.002-epoch_3-54b5c8aa.pth',
    'r2plus1d_34-tac_on_kinetics':
        f'{_W}/r2plus1d_34-tac_on_kinetics-0547130e.pth',
    'r2plus1d_34-tsp_on_activitynet-avg_gvf':
        f'{_W}/r2plus1d_34-tsp_on_activitynet-avg_gvf-backbone_lr_0.0001'
        '-fc_lr_0.004-epoch_5-8b74eaa2.pth',
    'r2plus1d_34-tsp_on_activitynet-no_gvf':
        f'{_W}/r2plus1d_34-tsp_on_activitynet-no_gvf-backbone_lr_0.0001'
        '-fc_lr_0.004-epoch_5-fb38fdd2.pth',
    'r2plus1d_18-tsp_on_activitynet':
        f'{_W}/r2plus1d_18-tsp_on_activitynet-max_gvf-backbone_lr_0.0001'
        '-fc_lr_0.002-epoch_6-22835b73.pth',
    'r2plus1d_18-tac_on_activitynet':
        f'{_W}/r2plus1d_18-tac_on_activitynet-backbone_lr_0.0001'
        '-fc_lr_0.004-epoch_5-9f56941a.pth',
    'r2plus1d_18-tac_on_kinetics':
        f'{_W}/r2plus1d_18-tac_on_kinetics-76ce975c.pth',
    'r3d_18-tsp_on_activitynet':
        f'{_W}/r3d_18-tsp_on_activitynet-max_gvf-backbone_lr_0.0001'
        '-fc_lr_0.002-epoch_6-85584422.pth',
    'r3d_18-tac_on_activitynet':
        f'{_W}/r3d_18-tac_on_activitynet-backbone_lr_0.001'
        '-fc_lr_0.01-epoch_5-31fd6e95.pth',
    'r3d_18-tac_on_kinetics':
        f'{_W}/r3d_18-tac_on_kinetics-dcd952c6.pth',
}


def fetch_released_tsp_checkpoint(name, dl_dir=None):
    """Resolve a released-checkpoint name to a local .pth, downloading it
    when egress exists.  Raises with the URL when offline so the user can
    fetch it out of band."""
    if name not in RELEASED_TSP_CHECKPOINTS:
        known = ', '.join(sorted(RELEASED_TSP_CHECKPOINTS))
        raise SystemExit(f'unknown released checkpoint {name!r}; '
                         f'known: {known}')
    url = RELEASED_TSP_CHECKPOINTS[name]
    dl_dir = dl_dir or os.path.join(REPO, 'data', 'downloads')
    os.makedirs(dl_dir, exist_ok=True)
    out = os.path.join(dl_dir, url.rsplit('/', 1)[-1])
    if os.path.exists(out):
        return out
    if not have_network():
        raise SystemExit(
            f'released checkpoint {name} is not cached and this '
            f'environment has no egress; fetch {url} to {dl_dir}')
    return fetch_url(url, dl_dir)
BMT = 'https://a3s.fi/swift/v1/AUTH_a235c0f452d648828f745589cde1219a/bmt'
METEOR_URL = ('https://github.com/cmu-mtlab/meteor/releases/download/'
              'v1.5/meteor-1.5.tar.gz')
CORENLP_URL = ('https://repo1.maven.org/maven2/edu/stanford/nlp/'
               'stanford-corenlp/3.4.1/stanford-corenlp-3.4.1.jar')

# data files that ship inside a reference checkout (annotations — public
# dataset metadata, copied locally instead of fetched when available)
REFERENCE_DATA = {
    'yc2_captions': [
        'data/yc2/captiondata/yc2_train.json',
        'data/yc2/captiondata/yc2_val.json',
        'data/yc2/captiondata/yc2_test.json',
        'data/yc2/captiondata/yc2_newval.json',
        'data/yc2/captiondata/para/para_yc2_val.json',
        'data/yc2/vocabulary_youcook2.json',
        'data/yc2/features/invalidVids.json',
    ],
    'anet_captions': [
        'data/anet/captiondata/train_modified.json',
        'data/anet/captiondata/val_1.json',
        'data/anet/captiondata/val_2.json',
        'data/anet/captiondata/fake_test.json',
        'data/anet/captiondata/para/anet_entities_val_1_para.json',
        'data/anet/captiondata/para/anet_entities_val_2_para.json',
        'data/anet/vocabulary_activitynet.json',
        'data/anet/features/I3D_vggish_invalid_videos.json',
        'data/anet/features/resnet_bn_invalid_videos.json',
    ],
}

# md5s published by the reference's i3d/vggish script (BMT mirrors)
MD5 = {
    'i3d_25fps_stack64step64_2stream_npy.zip':
        'd7266e440f8c616acbc0d8aaa4a336dc',
    'vggish_npy.zip': '9a654ad785e801aceb70af2a5e1cffbe',
}


def _untar_merge(tar_path, dest, subdirs=('training', 'validation',
                                          'testing')):
    """tar xzf + merge the split train/val/test folders into ``dest``
    (what the reference's tsn scripts do with mkdir/mv)."""
    os.makedirs(dest, exist_ok=True)
    tmp = dest + '.extract'
    os.makedirs(tmp, exist_ok=True)
    with tarfile.open(tar_path) as tf:
        tf.extractall(tmp)
    for sub in subdirs:
        d = os.path.join(tmp, sub)
        if os.path.isdir(d):
            for f in os.listdir(d):
                shutil.move(os.path.join(d, f), os.path.join(dest, f))
    shutil.rmtree(tmp, ignore_errors=True)


def _convert_h5(h5_path, out_dir, prefix='', key=''):
    subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools/convert_h5_features.py'),
         '--h5', h5_path, '--out', out_dir]
        + (['--prefix', prefix] if prefix else [])
        + (['--key', key] if key else []), check=True)


ARTIFACTS = {
    'yc2_captions': {
        'desc': 'YouCook2 caption annotations + vocabulary (local-copyable)',
        'reference_data': True,
    },
    'anet_captions': {
        'desc': 'ActivityNet caption annotations + vocabulary '
                '(local-copyable)',
        'reference_data': True,
    },
    'yc2_tsn': {
        'desc': 'YouCook2 TSN (resnet+bn) features (~9 GB)',
        'files': [f'{YC2_DENSECAP}/{s}_feat_yc2.tar.gz'
                  for s in ('training', 'validation', 'testing')],
        'post': lambda dl, dest: [
            _untar_merge(t, os.path.join(dest, 'yc2/features/resnet_bn'))
            for t in dl],
        'done': 'yc2/features/resnet_bn',
    },
    'anet_tsn': {
        'desc': 'ActivityNet TSN (resnet+bn) features (~30 GB)',
        'files': [f'{ANET_DENSECAP}/{s}_feat_anet.tar.gz'
                  for s in ('training', 'validation', 'testing')],
        'post': lambda dl, dest: [
            _untar_merge(t, os.path.join(dest, 'anet/features/resnet_bn'))
            for t in dl],
        'done': 'anet/features/resnet_bn',
    },
    'anet_c3d': {
        'desc': 'ActivityNet C3D features (6-part zip -> h5 -> npy)',
        'files': [f'{ANET_C3D}/activitynet_v1-3.part-0{i}'
                  for i in range(6)],
        'post': lambda dl, dest: (
            _cat_unzip(dl, os.path.join(dest, 'anet/features')),
            _convert_h5(os.path.join(dest, 'anet/features',
                                     'sub_activitynet_v1-3.c3d.hdf5'),
                        os.path.join(dest, 'anet/features/c3d'),
                        key='c3d_features')),
        'done': 'anet/features/c3d',
    },
    'anet_tsp': {
        'desc': 'ActivityNet TSP r2plus1d-34 features (h5 -> npy)',
        'files': [f'{TSP_REL}/activitynet_features/'
                  f'r2plus1d_34-tsp_on_activitynet-{s}_features.h5'
                  for s in ('train', 'valid', 'test')],
        'post': lambda dl, dest: [
            _convert_h5(h, os.path.join(dest, 'anet/features/tsp'),
                        prefix='v_') for h in dl],
        'done': 'anet/features/tsp',
    },
    'anet_i3d_vggish': {
        'desc': 'ActivityNet i3d (rgb+flow) + vggish features (BMT mirror)',
        'files': [f'{BMT}/i3d_25fps_stack64step64_2stream_npy.zip',
                  f'{BMT}/vggish_npy.zip'],
        'post': lambda dl, dest: [
            _unzip(z, os.path.join(dest, 'anet/features')) for z in dl],
        'done': 'anet/features/i3d_25fps_stack64step64_2stream_npy',
    },
    'meteor': {
        'desc': 'meteor-1.5 release (jar + paraphrase table + function '
                'words) for score-parity calibration',
        'files': [METEOR_URL],
        'post': lambda dl, dest: _setup_meteor(dl[0], dest),
        'done': 'externals/meteor-1.5/meteor-1.5.jar',
    },
    'corenlp': {
        'desc': 'stanford-corenlp 3.4.1 jar (PTBTokenizer parity)',
        'files': [CORENLP_URL],
        'post': lambda dl, dest: shutil.copy(
            dl[0], _ensured(os.path.join(dest, 'externals'))),
        'done': 'externals/stanford-corenlp-3.4.1.jar',
    },
}


def _ensured(d):
    os.makedirs(d, exist_ok=True)
    return d


def _unzip(z, dest):
    os.makedirs(dest, exist_ok=True)
    with zipfile.ZipFile(z) as zf:
        zf.extractall(dest)


def _cat_unzip(parts, dest):
    os.makedirs(dest, exist_ok=True)
    joined = os.path.join(dest, 'c3d_features.zip')
    with open(joined, 'wb') as out:
        for p in sorted(parts):
            with open(p, 'rb') as f:
                shutil.copyfileobj(f, out)
    _unzip(joined, dest)


def _setup_meteor(tar_path, dest):
    ext = _ensured(os.path.join(dest, 'externals'))
    with tarfile.open(tar_path) as tf:
        tf.extractall(ext)
    mdir = os.path.join(ext, 'meteor-1.5')
    jar = os.path.join(mdir, 'meteor-1.5.jar')
    # the English function-word list is a jar resource
    words = os.path.join(mdir, 'en.words')
    if os.path.exists(jar) and not os.path.exists(words):
        try:
            with zipfile.ZipFile(jar) as zf:
                with zf.open('function/en.words') as f:
                    open(words, 'wb').write(f.read())
        except KeyError:
            pass
    para = os.path.join(mdir, 'data', 'paraphrase-en.gz')
    print('METEOR artifacts ready. Export for score-parity runs:')
    print(f'  export DVC_METEOR_JAR={jar}')
    if os.path.exists(para):
        print(f'  export DVC_METEOR_PARAPHRASE={para}')
    if os.path.exists(words):
        print(f'  export DVC_METEOR_FUNCTION_WORDS={words}')


def _md5(path):
    h = hashlib.md5()
    with open(path, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            h.update(chunk)
    return h.hexdigest()


def have_network(timeout=5.0):
    for probe in ('http://youcook2.eecs.umich.edu',
                  'https://github.com'):
        try:
            urllib.request.urlopen(probe, timeout=timeout)
            return True
        except Exception:
            continue
    return False


def fetch_url(url, dl_dir, dry_run=False):
    name = url.rsplit('/', 1)[-1]
    out = os.path.join(dl_dir, name)
    if os.path.exists(out) and (name not in MD5 or _md5(out) == MD5[name]):
        print(f'  [have] {name}')
        return out
    if dry_run:
        print(f'  [would fetch] {url}')
        return out
    print(f'  [fetch] {url}')
    tmp = out + '.part'
    with urllib.request.urlopen(url) as r, open(tmp, 'wb') as f:
        shutil.copyfileobj(r, f)
    if name in MD5 and _md5(tmp) != MD5[name]:
        os.unlink(tmp)
        raise RuntimeError(f'md5 mismatch for {name}')
    os.replace(tmp, out)
    return out


def copy_reference_data(group, ref_root, dest, dry_run=False):
    missing = []
    for rel in REFERENCE_DATA[group]:
        src = os.path.join(ref_root, rel)
        dst = os.path.join(dest, os.path.relpath(rel, 'data'))
        if os.path.exists(dst):
            print(f'  [have] {dst}')
            continue
        if not os.path.exists(src):
            missing.append(rel)
            continue
        if dry_run:
            print(f'  [would copy] {src} -> {dst}')
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy(src, dst)
        print(f'  [copy] {dst}')
    return missing


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--list', action='store_true')
    ap.add_argument('--all', action='store_true')
    ap.add_argument('--only', default='',
                    help='comma-separated artifact groups')
    ap.add_argument('--dest', default=os.path.join(REPO, 'data'))
    ap.add_argument('--downloads', default=None,
                    help='staging dir for raw downloads '
                         '(default <dest>/_downloads)')
    ap.add_argument('--reference-root', default='/root/reference',
                    help='local reference checkout for annotation copies')
    ap.add_argument('--dry-run', action='store_true')
    ap.add_argument('--calibrate', action='store_true',
                    help='after fetching meteor, run '
                         'tools/calibrate_meteor.py')
    args = ap.parse_args()

    if args.list or not (args.all or args.only):
        for name, a in ARTIFACTS.items():
            print(f'{name:18s} {a["desc"]}')
        return 0

    groups = (list(ARTIFACTS) if args.all
              else [g.strip() for g in args.only.split(',') if g.strip()])
    unknown = [g for g in groups if g not in ARTIFACTS]
    if unknown:
        sys.exit(f'unknown artifact group(s): {unknown}; --list shows all')

    dl_dir = args.downloads or os.path.join(args.dest, '_downloads')
    os.makedirs(dl_dir, exist_ok=True)
    net = None
    failures = []
    for g in groups:
        a = ARTIFACTS[g]
        print(f'== {g}: {a["desc"]}')
        if a.get('reference_data'):
            missing = copy_reference_data(g, args.reference_root,
                                          args.dest, args.dry_run)
            if not missing:
                continue
            print(f'  reference checkout lacks {len(missing)} file(s); '
                  'network fetch for annotations is not mirrored — '
                  'supply --reference-root')
            failures.append(g)
            continue
        done = os.path.join(args.dest, a['done'])
        if os.path.exists(done):
            print(f'  [done] {done}')
            continue
        if net is None and not args.dry_run:
            net = have_network()
            if not net:
                print('  (no network egress detected — listing what would '
                      'be fetched)')
        try:
            dl = [fetch_url(u, dl_dir,
                            dry_run=args.dry_run or net is False)
                  for u in a['files']]
            if args.dry_run or net is False:
                failures.append(g) if net is False else None
                continue
            if 'post' in a:
                a['post'](dl, args.dest)
        except Exception as e:  # keep going; report at the end
            print(f'  [FAIL] {g}: {e}')
            failures.append(g)

    if args.calibrate and 'meteor' in groups and 'meteor' not in failures:
        mdir = os.path.join(args.dest, 'externals', 'meteor-1.5')
        env = dict(os.environ,
                   DVC_METEOR_JAR=os.path.join(mdir, 'meteor-1.5.jar'),
                   DVC_METEOR_PARAPHRASE=os.path.join(
                       mdir, 'data', 'paraphrase-en.gz'),
                   DVC_METEOR_FUNCTION_WORDS=os.path.join(mdir, 'en.words'))
        subprocess.run([sys.executable,
                        os.path.join(REPO, 'tools/calibrate_meteor.py')],
                       env=env, check=False)

    if failures:
        print(f'\nincomplete: {sorted(set(failures))} '
              '(re-run when network/reference data is available)')
        return 2
    print('\nall requested artifacts materialized')
    return 0


if __name__ == '__main__':
    sys.exit(main())
