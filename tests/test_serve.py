"""Serving API test: load a trained run, caption raw feature tensors."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synth import make_synth_dataset

pytestmark = pytest.mark.heavy


def test_dense_captioner(tmp_path):
    from dvc_tpu.utils.config import load_config
    from train import train
    anno, feats, vocab, vsize = make_synth_dataset(str(tmp_path))
    opt = load_config(
        id='serve_run', save_dir=str(tmp_path / 'save'), seed=7,
        train_caption_file=anno, val_caption_file=anno,
        gt_file_for_eval=[anno], gt_file_for_para_eval=[],
        dict_file=vocab, vocab_size=vsize,
        visual_feature_type='tsp', visual_feature_folder=feats,
        feature_dim=16, frame_embedding_num=24, gt_proposal_sample_num=4,
        max_caption_len=10, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=2, transformer_ff_dim=64, num_queries=10,
        input_encoding_size=32, rnn_size=64, att_hid_size=0,
        with_box_refine=True, caption_decoder_type='light',
        caption_loss_coef=1.0, count_loss_coef=0.5, batch_size=3,
        lr=1e-3, epoch=1, save_checkpoint_every=1, max_eseq_length=10,
        msda_impl='ref', invalid_video_json=[], batch_size_for_eval=3)
    save_folder = train(opt)

    from dvc_tpu.serve import DenseCaptioner
    dc = DenseCaptioner(save_folder, which='last')
    rng = np.random.default_rng(0)
    events = dc.caption_features(
        rng.standard_normal((30, 16)).astype(np.float32), duration=45.0)
    assert len(events) >= 1
    for e in events:
        assert 0 <= e['timestamp'][0] <= e['timestamp'][1] <= 45.0 + 1e-3
        assert isinstance(e['sentence'], str)
    # time-ordered
    starts = [e['timestamp'][0] for e in events]
    assert starts == sorted(starts)
