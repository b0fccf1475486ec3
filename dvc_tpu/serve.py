"""Batch inference / serving API.

Load a trained run once, then caption feature tensors or feature files —
the programmatic face of ``eval.py --eval_mode test`` for production use:

    from dvc_tpu.serve import DenseCaptioner
    dc = DenseCaptioner('save/yc2_run')
    events = dc.caption_features(feats, duration=120.0)
    # [{'timestamp': [t0, t1], 'sentence': ..., 'proposal_score': ...}, ...]

The compiled eval step is cached per batch shape; features are rescaled to
the model's static frame budget like the training pipeline.
"""

from __future__ import annotations

import os

import numpy as np

from .data import Translator
from .data.dataset import resize_feature
from .models import postprocess, to_dvc_records
from .train import Trainer, load_checkpoint, load_info_json
from .utils.config import load_config


class DenseCaptioner:
    def __init__(self, run_folder: str, which: str = 'best',
                 dict_file: str | None = None, opt=None):
        if opt is None:
            info = load_info_json(run_folder)
            if info is None:
                raise FileNotFoundError(f'no info.json in {run_folder}')
            opt = load_config(**info[which]['opt'])
        self.opt = opt
        ck = load_checkpoint(os.path.join(run_folder, f'model-{which}.ckpt'))
        self.params = ck['params']
        # fusion (NewModel) runs carry the attention-block params; build
        # the matching model so newTrain.py checkpoints serve directly
        self.is_fusion = 'visual_sa' in self.params.get('params', {})
        if self.is_fusion:
            from .models.fusion import make_fusion_model
            self.trainer = Trainer(opt, model=make_fusion_model(opt))
        else:
            self.trainer = Trainer(opt)
        self._state = None
        self.translator = Translator(dict_file or opt.dict_file,
                                     opt.vocab_size)

    def _make_batch(self, feats_list, durations, sound_list=None):
        opt = self.opt
        T, G, Lc = (opt.frame_embedding_num, opt.gt_proposal_sample_num,
                    opt.max_caption_len)
        B = len(feats_list)
        C = opt.feature_dim
        video = np.zeros((B, T, C), np.float32)
        vmask = np.zeros((B, T), bool)
        vlen = np.zeros((B, 3), np.float32)
        for b, f in enumerate(feats_list):
            if opt.data_rescale and f.shape[0] != T:
                f = resize_feature(f, T, opt.sample_method)
            L = min(len(f), T)
            video[b, :L] = f[:L]
            vmask[b, :L] = True
            vlen[b] = [L, durations[b], 1]
        batch = {
            'video_tensor': video, 'video_mask': vmask, 'video_length': vlen,
            'gt_boxes': np.zeros((B, G, 2), np.float32),
            'gt_boxes_mask': np.zeros((B, G), bool),
            'gt_labels': np.zeros((B, G), np.int32),
            'cap_tensor': np.zeros((B, G, Lc), np.int32),
            'cap_mask': np.zeros((B, G, Lc), bool),
        }
        if self.is_fusion:
            # HuBERT clip features aligned with the visual stream; zeros
            # when audio is unavailable (reference NewModel.py:111-114)
            sound = np.zeros((B, T, C), np.float32)
            for b, s in enumerate(sound_list or []):
                if s is None:
                    continue
                s = np.asarray(s, np.float32)
                if self.opt.data_rescale and s.shape[0] != T:
                    s = resize_feature(s, T, self.opt.sample_method)
                L = min(len(s), T)
                sound[b, :L] = s[:L]
            batch['sound_tensor'] = sound
        return batch

    def caption_features(self, feats, duration: float, top_k: int | None = None,
                         sound=None):
        """feats: (T, feature_dim) clip features of one video; ``sound``:
        optional (T, feature_dim) HuBERT features for fusion runs."""
        return self.caption_batch([np.asarray(feats)], [duration],
                                  top_k=top_k,
                                  sound_list=[sound])[0]

    def caption_batch(self, feats_list, durations, top_k: int | None = None,
                      sound_list=None):
        import jax.numpy as jnp
        batch = self._make_batch(feats_list, durations, sound_list)
        if self._state is None:
            self._state = {'params': self.params, 'opt_state': None,
                           'step': 0}
        out, _ = self.trainer.eval_step(self._state, batch)
        post = postprocess(out, jnp.asarray(durations, jnp.float32))
        records = to_dvc_records(
            post, [str(i) for i in range(len(feats_list))], durations,
            self.translator)
        results = []
        for i in range(len(feats_list)):
            events = records[str(i)]
            k = top_k or int(events[0]['pred_event_count']) if events else 0
            events = sorted(events, key=lambda e: e['proposal_score'],
                            reverse=True)[:k]
            results.append(sorted(events, key=lambda e: e['timestamp']))
        return results
