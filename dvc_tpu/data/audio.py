"""HuBERT audio features for the fusion model.

Reference: ``NewModel.py:99-138`` (``get_mfcc``): per clip segment, slice
the waveform, mono-mean, resample to 16 kHz, run HuBERT-base, mean-pool the
last layer to a 768-d vector; cache per-video feature tensors on disk and
fall back to zeros when the audio cannot be loaded.

Implementation: HuBERT runs through HuggingFace transformers on CPU torch
(a frozen feature extractor — there is no gradient path to it; see
``models/fusion.py`` docstring).  Extraction is an offline/cached data-prep
step feeding fixed-shape arrays to the jitted TPU model, exactly like the
reference's ``.pth`` cache.  Torch/torchaudio are imported lazily so the
TPU training path has no torch dependency.
"""

from __future__ import annotations

import math
import os

import numpy as np

HUBERT_SR = 16000
HUBERT_DIM = 768


class HubertExtractor:
    def __init__(self, cache_dir: str | None = None,
                 model_name: str = 'facebook/hubert-base-ls960'):
        self.cache_dir = cache_dir
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
        self.model_name = model_name
        self._model = None

    def _load_model(self):
        if self._model is None:
            import torch
            from transformers import HubertModel
            self._model = HubertModel.from_pretrained(self.model_name)
            self._model.eval()
            for p in self._model.parameters():
                p.requires_grad_(False)
        return self._model

    def _cache_path(self, video_key: str):
        if not self.cache_dir:
            return None
        return os.path.join(self.cache_dir, f'{video_key}.npy')

    def extract(self, audio_path: str, segments, video_key: str | None = None
                ) -> np.ndarray:
        """segments: [(t_start, t_end), ...] seconds.
        Returns (len(segments), 768) float32; zeros when audio fails."""
        cache = self._cache_path(video_key) if video_key else None
        if cache and os.path.exists(cache):
            feats = np.load(cache)
            if feats.shape[0] == len(segments):
                return feats.astype(np.float32)
        try:
            waveform, sr = self._load_audio(audio_path)
        except Exception:
            return np.zeros((len(segments), HUBERT_DIM), np.float32)

        import torch
        model = self._load_model()
        out = []
        for t0, t1 in segments:
            s = math.floor(t0 * sr)
            e = math.floor(t1 * sr)
            cut = waveform[:, s:e].mean(axis=0, keepdims=True)
            cut = self._resample(cut, sr, HUBERT_SR)
            with torch.no_grad():
                x = torch.from_numpy(cut.astype(np.float32))
                if x.shape[-1] < 400:  # HuBERT conv stack minimum
                    x = torch.nn.functional.pad(x, (0, 400 - x.shape[-1]))
                h = model(x).last_hidden_state  # (1, frames, 768)
            out.append(h.mean(dim=1).squeeze(0).numpy())
        feats = np.stack(out).astype(np.float32)
        if cache:
            np.save(cache, feats)
        return feats

    @staticmethod
    def _load_audio(path):
        """Waveform as (channels, samples) float numpy + sample rate."""
        try:
            import torchaudio
            w, sr = torchaudio.load(path)
            return w.numpy(), sr
        except Exception:
            import wave
            with wave.open(path, 'rb') as f:
                sr = f.getframerate()
                n = f.getnframes()
                data = np.frombuffer(f.readframes(n), np.int16)
                data = data.reshape(-1, f.getnchannels()).T
                return data.astype(np.float32) / 32768.0, sr

    @staticmethod
    def _resample(wave: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
        if sr == target_sr:
            return wave
        n_out = int(round(wave.shape[-1] * target_sr / sr))
        if n_out <= 1 or wave.shape[-1] <= 1:
            return np.zeros((wave.shape[0], max(n_out, 1)), np.float32)
        x_old = np.arange(wave.shape[-1]) / sr
        x_new = np.arange(n_out) / target_sr
        return np.stack([np.interp(x_new, x_old, ch) for ch in wave])
