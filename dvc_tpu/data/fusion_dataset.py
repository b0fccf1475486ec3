"""Dataset for the audio-visual fusion model (reference ``NewDataset.py``).

The reference joins per-clip segment tables from the TSP metadata CSVs with
caption annotations by 13-char YouTube id (NewDataset.py:104-108) and loads
pre-extracted TSP/MViTv2 clip features; HuBERT audio features are extracted
per segment and disk-cached (NewModel.py:106-136).

Clip segments come from the TSP metadata/clip CSV when one is given
(``metadata_csv`` / opt ``valid_csv_filename`` / ``train_csv_filename``),
joined to annotations by 13-char id exactly as the reference does
(NewDataset.py:54-108): a metadata CSV (filename, fps, video-frames) is
expanded to clip windows with the eval-dataset formula
(eval_video_dataset_2.py:91-115); a labeled clip CSV (clip-t-start /
t-start rows) is used row-for-row.  Without a CSV the segments fall back
to uniform windows — exactly equivalent for contiguous stride-16
extraction, approximate otherwise.  Visual + audio streams are rescaled
together to the static ``frame_embedding_num`` so every batch compiles to
one shape.  Audio failures degrade to zero features as in the reference.
"""

from __future__ import annotations

import csv
import json
import os

import numpy as np

from .audio import HUBERT_DIM, HubertExtractor
from .dataset import DenseCaptionDataset, collate, resize_feature
from .video_clips import make_clip_table


def load_clip_segments_csv(path: str, clip_len: int = 16,
                           frame_rate: float = 15.0, stride: int = 16):
    """CSV -> {13-char id: [(t_start, t_end), ...]}.

    Handles both reference CSV schemas: a video metadata table
    (filename, fps, video-frames) expanded via the clip-window formula
    (reference eval_video_dataset_2.py:91-115), and a labeled clip table
    whose rows carry per-clip ``clip-t-start`` / ``t-start`` directly
    (untrimmed_video_dataset_2.py:75-86).
    """
    segments: dict = {}
    clip_len_sec = clip_len / float(frame_rate)
    with open(path) as f:
        rows = list(csv.DictReader(f))
    for r in rows:
        key13 = os.path.splitext(os.path.basename(r['filename']))[0][:13]
        if 'video-frames' in r and r.get('video-frames'):
            clips = make_clip_table(
                r['filename'], float(r['fps']),
                int(float(r['video-frames'])), clip_len, frame_rate, stride)
            segments.setdefault(key13, []).extend(
                (c.t_start, c.t_end) for c in clips)
        else:
            t0 = float(r.get('clip-t-start') or r.get('t-start') or 0.0)
            segments.setdefault(key13, []).append((t0, t0 + clip_len_sec))
    return segments


class FusionDataset(DenseCaptionDataset):
    """DenseCaptionDataset + per-video HuBERT sound features."""

    def __init__(self, anno_file, feature_folder, translator_json,
                 is_training, opt, seed: int = 0,
                 sound_feature_folder: str | None = None,
                 audio_folder: str | None = None,
                 extractor: HubertExtractor | None = None,
                 metadata_csv: str | None = None):
        super().__init__(anno_file, feature_folder, translator_json,
                         is_training, opt, seed)
        self.sound_feature_folder = (sound_feature_folder or
                                     getattr(opt, 'sound_feature_folder', None))
        # dim of the zero-fallback for missing audio (reference
        # NewModel.py:111-114 zeroes at HuBERT's 768).  Configurable via
        # --sound_feature_dim; when unset, learn it from any cached
        # feature file so non-HuBERT caches keep batches
        # dimension-consistent (a 768 fallback mixed with e.g. 16-d
        # cached rows breaks the collate)
        self.sound_dim = int(getattr(opt, 'sound_feature_dim', 0) or 0)
        if not self.sound_dim and self.sound_feature_folder:
            import glob as _glob
            for p in _glob.glob(os.path.join(self.sound_feature_folder,
                                             '*.npy'))[:1]:
                self.sound_dim = int(np.load(p, mmap_mode='r').shape[1])
        self.sound_dim = self.sound_dim or HUBERT_DIM
        self.audio_folder = audio_folder
        self.extractor = extractor
        if metadata_csv is None:
            metadata_csv = getattr(
                opt, 'train_csv_filename' if is_training
                else 'valid_csv_filename', None)
        self.clip_segments = {}
        if metadata_csv and os.path.exists(metadata_csv):
            self.clip_segments = load_clip_segments_csv(
                metadata_csv,
                clip_len=int(getattr(opt, 'clip_len', 16) or 16),
                frame_rate=float(getattr(opt, 'frame_rate', 15) or 15),
                stride=int(getattr(opt, 'stride', 16) or 16))

    def segments_for(self, key13: str, n_clips: int, duration: float):
        """Per-clip (start, end) windows: the CSV-joined table when
        available (reference NewDataset.py:104-108), else uniform."""
        segs = self.clip_segments.get(key13)
        if segs:
            return segs[:n_clips] if len(segs) >= n_clips else (
                segs + [segs[-1]] * (n_clips - len(segs)))
        return [(i * duration / n_clips, (i + 1) * duration / n_clips)
                for i in range(n_clips)]

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
                    segments = self.segments_for(key13, n_clips, duration)
                    return self.extractor.extract(ap, segments, key13)
        return np.zeros((n_clips, self.sound_dim), np.float32)

    def __getitem__(self, idx: int):
        s = super().__getitem__(idx)
        n_clips = s['feats'].shape[0]
        sound = self.load_sound(s['key'], n_clips, s['duration'])
        assert sound.shape[1] == self.sound_dim, (
            f'sound features for {s["key"]} are {sound.shape[1]}-d but the '
            f'run expects {self.sound_dim} (set --sound_feature_dim)')
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
