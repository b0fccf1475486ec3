"""Feature-mode dataset + static-shape collation.

Reference: ``data/video_dataset.py`` (PropSeqDataset + collate_fn).  Loads
per-video ``.npy``/``.csv`` features, temporally rescales them to a fixed
``frame_embedding_num``, subsamples gt events to ``gt_proposal_sample_num``,
tokenizes captions, and collates to *static* shapes:

  video (B, T, C) / gt (B, G, 2) / captions (B, G, Lc)

The reference pads dynamically to the batch max and flattens captions to a
ragged (total_caption_num, Lc) tensor; on TPU static padding + masks lets
the whole step compile once.  Captions stay aligned per (video, gt-slot) —
the criterion matches gt slots to queries, so the flattening was only ever
an indexing convenience.

Missing feature files degrade to zero padding, and invalid-video json lists
filter keys, as in the reference (``video_dataset.py:192-194,328-331``).
"""

from __future__ import annotations

import json
import os

import numpy as np

from .vocabulary import Translator

# per-type feature dims / normalization / filename patterns
# (reference get_feats, video_dataset.py:337-383)
FEATURE_SPECS = {
    'c3d': dict(dim=500, mean=-0.001915027447565527, var=1.9239444588254049,
                path=lambda folder, key: os.path.join(folder, key[0:13] + '.npy')),
    'resnet': dict(dim=2048, mean=0.41634243404998694, var=0.2569392081183313,
                   path=lambda folder, key: os.path.join(folder, key[2:13] + '_resnet.npy')),
    'bn': dict(dim=1024, mean=0.8945046635916155, var=3.6579982046018844,
               path=lambda folder, key: os.path.join(folder, key[2:13] + '_bn.npy')),
    'tsn_100': dict(dim=400, mean=0., var=1.,
                    path=lambda folder, key: os.path.join(folder, key[0:13] + '.csv')),
    'i3d_rgb': dict(dim=1024, mean=0., var=1.,
                    path=lambda folder, key: os.path.join(folder, key[:13] + '_rgb.npy')),
    'i3d_flow': dict(dim=1024, mean=0., var=1.,
                     path=lambda folder, key: os.path.join(folder, key[:13] + '_flow.npy')),
    'tsp': dict(dim=512, mean=0., var=1.,
                path=lambda folder, key: os.path.join(folder, key[0:13] + '.npy')),
    'tsp_mvit': dict(dim=768, mean=0., var=1.,
                     path=lambda folder, key: os.path.join(folder, key[0:13] + '.npy')),
    'vggish': dict(dim=128, mean=0., var=1.,
                   path=lambda folder, key: os.path.join(folder, key[0:13] + '.npy')),
}


def read_feature_file(path: str, feat_dim: int, mean=0., var=1.,
                      data_norm=False):
    """Load one feature file; zero-pad (100, dim) when missing."""
    if os.path.exists(path):
        ext = path.split('.')[-1]
        if ext == 'npy':
            from . import native_io
            feats = native_io.load_npy(path) if native_io.available() else None
            if feats is None:
                feats = np.load(path)
        elif ext == 'csv':
            import pandas as pd
            feats = pd.read_csv(path).values
        else:
            raise NotImplementedError(ext)
        padding = False
    else:
        feats = np.zeros((100, feat_dim), np.float32)
        padding = True
    if data_norm:
        feats = (feats - mean) / np.sqrt(var)
    return feats.astype(np.float32), padding


def resize_feature(feats: np.ndarray, new_size: int,
                   method: str = 'nearest') -> np.ndarray:
    """Temporal rescale (reference resizeFeature, video_dataset.py:386-397)."""
    from . import native_io
    if native_io.available() and feats.ndim == 2 and len(feats) > 1:
        out = native_io.resize_feature(feats, new_size, method)
        if out is not None:
            return out
    orig = len(feats)
    if orig == 1:
        return np.repeat(feats.reshape(1, -1), new_size, axis=0)
    if new_size == 1:
        x_new = np.zeros(1)
    else:
        x_new = np.arange(new_size) * (orig - 1) / (new_size - 1)
    if method == 'nearest':
        idx = np.clip(np.round(x_new).astype(np.int64), 0, orig - 1)
        return feats[idx]
    lo = np.clip(np.floor(x_new).astype(np.int64), 0, orig - 1)
    hi = np.clip(lo + 1, 0, orig - 1)
    w = (x_new - lo)[:, None].astype(np.float32)
    return feats[lo] * (1 - w) + feats[hi] * w


class DenseCaptionDataset:
    """PropSeqDataset equivalent (reference video_dataset.py:183-293)."""

    def __init__(self, anno_file: str, feature_folder, translator_json: str,
                 is_training: bool, opt, seed: int = 0):
        with open(anno_file) as f:
            self.anno = json.load(f)
        self.translator = Translator(translator_json, opt.vocab_size)
        self.keys = list(self.anno.keys())
        for json_path in opt.invalid_video_json:
            with open(json_path) as f:
                invalid = json.load(f)
            self.keys = [k for k in self.keys if k[:13] not in invalid]
        self.feature_folder = feature_folder
        self.opt = opt
        self.is_training = is_training
        self.rng = np.random.default_rng(seed)
        self.max_caption_len = opt.max_caption_len
        self.gt_proposal_sample_num = opt.gt_proposal_sample_num

    def __len__(self):
        return len(self.keys)

    def load_feats(self, key: str) -> np.ndarray:
        opt = self.opt
        vf_types = opt.visual_feature_type
        if not isinstance(vf_types, (list, tuple)):
            vf_types = [vf_types]
            folders = [self.feature_folder]
        else:
            folders = self.feature_folder
            assert len(folders) == len(vf_types)
        parts = []
        for vf_type, folder in zip(vf_types, folders):
            spec = FEATURE_SPECS[vf_type]
            # zero-pad dim for a missing file: the configured total dim when
            # a single feature type is used (supports non-standard dims),
            # else the canonical per-type dim
            pad_dim = opt.feature_dim if len(vf_types) == 1 else spec['dim']
            feats, _ = read_feature_file(
                spec['path'](folder, key), pad_dim, spec['mean'],
                spec['var'], data_norm=bool(opt.data_norm))
            if opt.data_rescale:
                if feats.shape[0] != opt.frame_embedding_num:
                    feats = resize_feature(feats, opt.frame_embedding_num,
                                           opt.sample_method)
            else:
                feats = feats[::opt.feature_sample_rate]
            parts.append(feats)
        out = np.concatenate(parts, axis=-1)
        assert out.shape[1] == opt.feature_dim, \
            f'feature_dim mismatch: {out.shape[1]} != {opt.feature_dim}'
        return out

    def __getitem__(self, idx: int):
        key = str(self.keys[idx])
        feats = self.load_feats(key)
        entry = self.anno[key]
        duration = entry['duration']
        captions = entry['sentences']
        gt_timestamps = entry['timestamps']
        action_labels = entry.get('action_labels', [0] * len(gt_timestamps))

        # random gt subsample to the static budget, order-preserving
        # (reference video_dataset.py:276-282, applied in train and eval)
        n = len(gt_timestamps)
        g = min(n, self.gt_proposal_sample_num)
        if n > g:
            keep = set(self.rng.choice(n, g, replace=False).tolist())
        else:
            keep = set(range(n))
        captions = [captions[i] for i in range(n) if i in keep]
        gt_timestamps = [gt_timestamps[i] for i in range(n) if i in keep]
        action_labels = [action_labels[i] for i in range(n) if i in keep]

        cap_ids = [self.translator.translate(s, self.max_caption_len)
                   for s in captions]
        return dict(feats=feats, gt_timestamps=gt_timestamps,
                    labels=action_labels, cap_ids=cap_ids,
                    duration=duration, captions=captions, key=key)


def collate(samples, T: int, G: int, Lc: int):
    """Static-shape collation (reference collate_fn, video_dataset.py:15-149).

    T/G/Lc: static pads for frames / gt events / caption length.
    """
    B = len(samples)
    C = samples[0]['feats'].shape[1]
    video = np.zeros((B, T, C), np.float32)
    vmask = np.zeros((B, T), bool)
    vlen = np.zeros((B, 3), np.float32)
    boxes = np.zeros((B, G, 2), np.float32)
    gmask = np.zeros((B, G), bool)
    labels = np.zeros((B, G), np.int64)
    caps = np.zeros((B, G, Lc), np.int64)
    cmask = np.zeros((B, G, Lc), bool)
    keys, durations, raw_ts, raw_caps = [], [], [], []

    for b, s in enumerate(samples):
        f = s['feats']
        L = min(len(f), T)
        video[b, :L] = f[:L]
        vmask[b, :L] = True
        dur = float(s['duration'])
        g = min(len(s['gt_timestamps']), G)
        vlen[b] = [L, dur, g]
        for j in range(g):
            ts = s['gt_timestamps'][j]
            boxes[b, j] = [(ts[1] + ts[0]) / (2 * dur), (ts[1] - ts[0]) / dur]
            gmask[b, j] = True
            labels[b, j] = s['labels'][j]
            ids = s['cap_ids'][j][:Lc]
            caps[b, j, :len(ids)] = ids
            cmask[b, j, :len(ids)] = True
        keys.append(s['key'])
        durations.append(dur)
        raw_ts.append(s['gt_timestamps'])
        raw_caps.append(s.get('captions'))

    batch = {
        'video_tensor': video, 'video_mask': vmask, 'video_length': vlen,
        'gt_boxes': boxes, 'gt_boxes_mask': gmask,
        'gt_labels': labels.astype(np.int32),
        'cap_tensor': caps.astype(np.int32), 'cap_mask': cmask,
    }
    meta = {'keys': keys, 'durations': durations, 'raw_timestamps': raw_ts,
            'raw_captions': raw_caps}
    return batch, meta


class BatchLoader:
    """Minimal shuffling batch iterator over a DenseCaptionDataset.

    Multi-host: pass ``process_index``/``process_count`` (or leave None on
    a ``jax.distributed``-initialized runtime to auto-detect) and each host
    iterates only its own strided slice of the epoch permutation — the
    DistributedSampler equivalent (SURVEY.md §2.9); call ``set_epoch`` per
    epoch so the shared shuffle reseeds identically on every host.
    """

    def __init__(self, dataset: DenseCaptionDataset, batch_size: int,
                 shuffle: bool, opt, drop_last: bool | None = None,
                 seed: int = 0, process_index: int | None = None,
                 process_count: int | None = None):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.opt = opt
        self.seed = seed
        self.epoch = 0
        self._epoch_pinned = False   # set_epoch never called: auto-advance
        self.process_index = process_index
        self.process_count = process_count
        # static pads
        self.T = opt.frame_embedding_num
        self.G = opt.gt_proposal_sample_num
        self.Lc = opt.max_caption_len
        self.drop_last = (shuffle if drop_last is None else drop_last)

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)
        self._epoch_pinned = True

    def _host_samples(self):
        if self.process_count in (None, 1) and self.process_index is None:
            return len(self.ds)
        from ..parallel.multihost import host_shard_order
        return len(host_shard_order(
            len(self.ds), 0, False, self.seed,
            self.process_index, self.process_count))

    def __len__(self):
        n = self._host_samples()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        epoch = self.epoch
        if not self._epoch_pinned:
            self.epoch += 1          # drivers that never set_epoch still get per-pass reshuffles
        if self.process_count not in (None, 1) or self.process_index is not None:
            from ..parallel.multihost import host_shard_order
            order = host_shard_order(
                len(self.ds), epoch, self.shuffle, self.seed,
                self.process_index, self.process_count)
        else:
            order = np.arange(len(self.ds))
            if self.shuffle:
                np.random.default_rng(
                    self.seed + 1000003 * epoch).shuffle(order)
        nb = len(self)
        for i in range(nb):
            idxs = order[i * self.batch_size:(i + 1) * self.batch_size]
            n_real = len(idxs)
            if len(idxs) < self.batch_size:
                # repeat last sample to keep static batch shape; mask via meta
                idxs = np.concatenate(
                    [idxs, np.repeat(idxs[-1:], self.batch_size - len(idxs))])
            samples = [self.ds[int(j)] for j in idxs]
            batch, meta = collate(samples, self.T, self.G, self.Lc)
            meta['n_real'] = n_real
            yield batch, meta
