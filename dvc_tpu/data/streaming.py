"""Streaming decode -> TSP features -> train pipeline (no .npy round trip).

The reference's end-to-end path materializes features on disk between the
backbone and PDVC: ``ete/eval.py:144-194`` shells out to the extractor,
writes per-video ``.npy``, then re-reads them through PropSeqDataset.
BASELINE.json's TPU-native north star is the opposite: decode and
featurize on the fly and stream fixed-shape tensors toward HBM.

``StreamingFeatureDataset`` is a drop-in ``DenseCaptionDataset`` whose
``load_feats`` decodes the video's clips (cv2, host) and runs the TSP
backbone (jit, device) directly — no feature files.  Overlap comes from
the existing input pipeline: wrap the loader in ``PrefetchLoader`` /
``DevicePrefetchLoader`` (``train.py`` does, via ``device_prefetch``) and
the decode of batch i+1 runs in the worker thread while the device trains
on batch i; within a video, clip-batch decode overlaps the backbone
forward because jax dispatch is asynchronous (the result is only forced
after the next batch is decoded).

With a frozen backbone (the feature-mode training regime) the features
are deterministic, so an in-memory LRU keeps repeat epochs at
feature-mode speed; pass ``cache_size=0`` (or call ``refresh()`` after a
backbone update) for the joint-training regime where features must track
the current weights — the streaming analogue of the reference re-running
extraction every eval.
"""

from __future__ import annotations

import collections
import glob
import os

import numpy as np

from .dataset import FEATURE_SPECS, DenseCaptionDataset, resize_feature

VIDEO_EXTS = ('.mp4', '.mkv', '.webm', '.avi')


def index_videos(video_dir: str) -> dict:
    """Map 13-char video key -> file path (reference file naming:
    ``<video_id>.mp4`` with YouTube-style ids)."""
    table = {}
    for p in sorted(glob.glob(os.path.join(video_dir, '*'))):
        if p.lower().endswith(VIDEO_EXTS):
            table[os.path.splitext(os.path.basename(p))[0][:13]] = p
    return table


class StreamingFeatureDataset(DenseCaptionDataset):
    """DenseCaptionDataset over raw videos: features come from the TSP
    backbone at load time instead of ``.npy`` files."""

    def __init__(self, anno_file: str, video_dir: str,
                 translator_json: str, is_training: bool, opt,
                 seed: int = 0, extractor=None, cache_size: int = 4096):
        super().__init__(anno_file, video_dir, translator_json,
                         is_training, opt, seed=seed)
        self.videos = index_videos(video_dir)
        # annotations without a video file degrade to zero features (the
        # missing-file semantics of the feature path, video_dataset.py:328)
        if extractor is None:
            from ..models.tsp import FeatureExtractor
            extractor = FeatureExtractor(
                getattr(opt, 'backbone_tsp', 'mvit_v2_s'),
                getattr(opt, 'tsp_checkpoint', '') or None,
                clip_len=getattr(opt, 'clip_len', 16),
                dtype=getattr(opt, 'extraction_dtype', 'bfloat16'))
        self.extractor = extractor
        self.frame_rate = getattr(opt, 'frame_rate', 15)
        self.stride = getattr(opt, 'stride', 16)
        self.clip_batch_size = getattr(opt, 'in_batch_size', 32)
        self._cache_size = cache_size
        self._cache: collections.OrderedDict = collections.OrderedDict()
        vf = opt.visual_feature_type
        vf = vf[0] if isinstance(vf, (list, tuple)) else vf
        self._spec = FEATURE_SPECS.get(vf, FEATURE_SPECS['tsp_mvit'])

    def refresh(self):
        """Drop cached features (call after a backbone weight update)."""
        self._cache.clear()

    def _extract(self, key: str) -> np.ndarray:
        path = self.videos.get(key[:13])
        if path is None:
            return np.zeros((100, self.opt.feature_dim), np.float32)
        from .video_clips import video_metadata
        try:
            fps, n_frames, _ = video_metadata(path)
        except IOError:
            return np.zeros((100, self.opt.feature_dim), np.float32)
        feats = self.extractor.extract_video(
            path, fps, n_frames, frame_rate=self.frame_rate,
            stride=self.stride, batch_size=self.clip_batch_size)
        if not len(feats):
            return np.zeros((100, self.opt.feature_dim), np.float32)
        return feats

    def load_feats(self, key: str) -> np.ndarray:
        opt = self.opt
        k = key[:13]
        feats = self._cache.get(k)
        if feats is None:
            feats = self._extract(key)
            if self._cache_size:
                self._cache[k] = feats
                while len(self._cache) > self._cache_size:
                    self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(k)
        if bool(opt.data_norm):
            feats = ((feats - self._spec['mean'])
                     / np.sqrt(self._spec['var'])).astype(np.float32)
        if opt.data_rescale:
            if feats.shape[0] != opt.frame_embedding_num:
                feats = resize_feature(feats, opt.frame_embedding_num,
                                       opt.sample_method)
        else:
            feats = feats[::opt.feature_sample_rate]
        assert feats.shape[1] == opt.feature_dim, \
            f'feature_dim mismatch: {feats.shape[1]} != {opt.feature_dim}'
        return feats
