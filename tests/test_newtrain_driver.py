"""newTrain.py fusion driver end-to-end on synthetic data (sound features
cached as npy; mid-epoch visited-video checkpointing)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synth import make_synth_dataset

pytestmark = pytest.mark.heavy


def test_newtrain_driver(tmp_path):
    anno, feats, vocab, vsize = make_synth_dataset(str(tmp_path))
    sound_dir = tmp_path / 'sound'
    sound_dir.mkdir()
    # pre-cache sound features for half the videos; rest fall back to zeros
    with open(anno) as f:
        keys = list(json.load(f).keys())
    rng = np.random.default_rng(0)
    for k in keys[:3]:
        np.save(sound_dir / f'{k[:13]}.npy',
                rng.standard_normal((24, 16)).astype(np.float32))

    from dvc_tpu.utils.config import load_config
    from newTrain import main as new_main

    opt = load_config(
        id='fusion_run', save_dir=str(tmp_path / 'save'), seed=3,
        train_caption_file=anno, val_caption_file=anno,
        gt_file_for_eval=[anno], gt_file_for_para_eval=[],
        dict_file=vocab, vocab_size=vsize,
        visual_feature_type='tsp', visual_feature_folder=feats,
        feature_dim=16, frame_embedding_num=24, gt_proposal_sample_num=3,
        max_caption_len=8, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=2, transformer_ff_dim=64, num_queries=8,
        input_encoding_size=32, rnn_size=64, att_hid_size=0,
        with_box_refine=True, caption_decoder_type='light',
        caption_loss_coef=1.0, count_loss_coef=0.5, batch_size=2,
        lr=1e-3, epoch=1, save_checkpoint_every=1, max_eseq_length=8,
        msda_impl='ref', invalid_video_json=[], batch_size_for_eval=2,
        sound_feature_folder=str(sound_dir), ckpt_every_batches=2,
        start_from='', pretrain=None, debug=False)
    new_main(opt)
    run_dir = tmp_path / 'save' / 'fusion_run'
    assert (run_dir / 'model-last.ckpt').exists()
    assert (run_dir / 'info.json').exists()

    # a newTrain run serves directly: DenseCaptioner detects the fusion
    # params and accepts (or zero-fills) per-video sound features
    from dvc_tpu.serve import DenseCaptioner
    dc = DenseCaptioner(str(run_dir), which='last')
    assert dc.is_fusion
    feats16 = rng.standard_normal((30, 16)).astype(np.float32)
    sound16 = rng.standard_normal((30, 16)).astype(np.float32)
    with_sound = dc.caption_features(feats16, duration=45.0, sound=sound16)
    no_sound = dc.caption_features(feats16, duration=45.0)
    for events in (with_sound, no_sound):
        for e in events:
            assert 0 <= e['timestamp'][0] <= e['timestamp'][1] <= 45.0 + 1e-3
            assert isinstance(e['sentence'], str)
