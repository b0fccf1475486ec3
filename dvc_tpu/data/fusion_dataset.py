"""Dataset for the audio-visual fusion model (reference ``NewDataset.py``).

The reference joins per-clip segment tables from the TSP metadata CSVs with
caption annotations by 13-char YouTube id (NewDataset.py:104-108) and loads
pre-extracted TSP/MViTv2 clip features; HuBERT audio features are extracted
per segment and disk-cached (NewModel.py:106-136).

TPU adaptation: clip segments default to uniform windows matching the
visual feature count when no metadata CSV is given (stride-16 TSP clips are
contiguous uniform windows anyway); visual + audio streams are rescaled
together to the static ``frame_embedding_num`` so every batch compiles to
one shape.  Audio failures degrade to zero features as in the reference.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .audio import HUBERT_DIM, HubertExtractor
from .dataset import DenseCaptionDataset, collate, resize_feature


class FusionDataset(DenseCaptionDataset):
    """DenseCaptionDataset + per-video HuBERT sound features."""

    def __init__(self, anno_file, feature_folder, translator_json,
                 is_training, opt, seed: int = 0,
                 sound_feature_folder: str | None = None,
                 audio_folder: str | None = None,
                 extractor: HubertExtractor | None = None):
        super().__init__(anno_file, feature_folder, translator_json,
                         is_training, opt, seed)
        self.sound_feature_folder = (sound_feature_folder or
                                     getattr(opt, 'sound_feature_folder', None))
        self.audio_folder = audio_folder
        self.extractor = extractor

    def load_sound(self, key: str, n_clips: int, duration: float) -> np.ndarray:
        key13 = key[:13]
        # cached per-video features (the reference's .pth cache, as .npy)
        if self.sound_feature_folder:
            p = os.path.join(self.sound_feature_folder, key13 + '.npy')
            if os.path.exists(p):
                return np.load(p).astype(np.float32)
        if self.extractor and self.audio_folder:
            for ext in ('.mp4', '.wav', '.mkv', '.webm'):
                ap = os.path.join(self.audio_folder, key13 + ext)
                if os.path.exists(ap):
                    segments = [(i * duration / n_clips,
                                 (i + 1) * duration / n_clips)
                                for i in range(n_clips)]
                    return self.extractor.extract(ap, segments, key13)
        return np.zeros((n_clips, HUBERT_DIM), np.float32)

    def __getitem__(self, idx: int):
        s = super().__getitem__(idx)
        n_clips = s['feats'].shape[0]
        sound = self.load_sound(s['key'], n_clips, s['duration'])
        if sound.shape[0] != n_clips:
            sound = resize_feature(sound, n_clips, 'nearest')
        s['sound'] = sound.astype(np.float32)
        return s


def fusion_collate(samples, T: int, G: int, Lc: int):
    batch, meta = collate(samples, T, G, Lc)
    D = samples[0]['sound'].shape[1]
    sound = np.zeros((len(samples), T, D), np.float32)
    for b, s in enumerate(samples):
        L = min(len(s['sound']), T)
        sound[b, :L] = s['sound'][:L]
    batch['sound_tensor'] = sound
    return batch, meta


class FusionBatchLoader:
    def __init__(self, dataset: FusionDataset, batch_size: int, shuffle: bool,
                 opt, seed: int = 0, drop_last: bool | None = None,
                 skip_keys: set | None = None):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.opt = opt
        self.rng = np.random.default_rng(seed)
        self.T = opt.frame_embedding_num
        self.G = opt.gt_proposal_sample_num
        self.Lc = opt.max_caption_len
        self.drop_last = (shuffle if drop_last is None else drop_last)
        # mid-epoch resume support (reference newTrain.py:289-306):
        # previously visited video keys are skipped for the current epoch
        self.skip_keys = skip_keys or set()

    def __len__(self):
        n = len(self.ds)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(order)
        if self.skip_keys:
            order = np.array([i for i in order
                              if self.ds.keys[i] not in self.skip_keys],
                             np.int64)
        nb = (len(order) // self.batch_size if self.drop_last else
              (len(order) + self.batch_size - 1) // self.batch_size)
        for i in range(nb):
            idxs = order[i * self.batch_size:(i + 1) * self.batch_size]
            if len(idxs) == 0:
                return
            if len(idxs) < self.batch_size:
                idxs = np.concatenate(
                    [idxs, np.repeat(idxs[-1:], self.batch_size - len(idxs))])
            samples = [self.ds[int(j)] for j in idxs]
            yield fusion_collate(samples, self.T, self.G, self.Lc)
