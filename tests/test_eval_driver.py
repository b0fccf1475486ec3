"""eval.py driver: the REFERENCE command-line shape must run unchanged
(reference eval.py:157-169 — --eval_folder under --eval_save_dir,
--eval_model_path, --eval_tool_version, inert --gpu_id), and test mode
must build fake captions from a metadata CSV and write dvc_results.json
(reference naming)."""
import json
import os
import runpy
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from synth import make_synth_dataset


def _train_tiny(tmp_path, run_id):
    from dvc_tpu.utils.config import load_config
    from train import train
    anno, feats, vocab, vsize = make_synth_dataset(str(tmp_path))
    opt = load_config(
        id=run_id, save_dir=str(tmp_path / 'save'), seed=7,
        train_caption_file=anno, val_caption_file=anno,
        gt_file_for_eval=[anno], gt_file_for_para_eval=[],
        dict_file=vocab, vocab_size=vsize,
        visual_feature_type='tsp', visual_feature_folder=feats,
        feature_dim=16, frame_embedding_num=16, gt_proposal_sample_num=3,
        max_caption_len=8, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=1, transformer_ff_dim=64, num_queries=6,
        input_encoding_size=32, rnn_size=64, att_hid_size=0,
        caption_decoder_type='light', batch_size=3, lr=1e-3, epoch=1,
        save_checkpoint_every=1, min_epoch_when_save=-1, max_eseq_length=5,
        msda_impl='ref', invalid_video_json=[], batch_size_for_eval=3)
    return train(opt), anno


def _run_eval(argv):
    old = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(os.path.join(ROOT, 'eval.py'), run_name='__main__')
    finally:
        sys.argv = old


@pytest.mark.heavy
def test_eval_reference_command_line(tmp_path):
    run_folder, anno = _train_tiny(tmp_path, 'refcli')
    save_root = os.path.dirname(run_folder)
    folder = os.path.basename(run_folder)

    # the reference invocation shape: run dir = save_dir/eval_folder,
    # explicit model path, tool version, inert gpu flag
    _run_eval(['eval.py',
               '--eval_save_dir', save_root,
               '--eval_folder', folder,
               '--eval_model_path', os.path.join(run_folder,
                                                 'model-last.ckpt'),
               '--eval_model', 'last',
               '--eval_transformer_input_type', 'queries',
               '--eval_tool_version', '2021',
               '--eval_caption_file', anno,
               '--gpu_id', '0'])
    out = os.path.join(run_folder, 'eval_results.json')
    assert os.path.exists(out)
    with open(out) as f:
        res = json.load(f)
    assert res['results']

    # test mode: fake captions from a metadata CSV, dvc_results.json out
    feats_dir = os.path.join(str(tmp_path), 'features')
    keys = sorted(os.path.splitext(p)[0]
                  for p in os.listdir(feats_dir))[:2]
    csv_path = str(tmp_path / 'meta.csv')
    with open(csv_path, 'w') as f:
        f.write('filename,video-duration,fps,video-frames\n')
        for k in keys:
            f.write(f'{k}.mp4,60.0,30.0,1800\n')
    _run_eval(['eval.py',
               '--eval_save_dir', save_root,
               '--eval_folder', folder,
               '--eval_mode', 'test',
               '--eval_model', 'last',
               '--test_video_feature_folder', feats_dir,
               '--test_video_meta_data_csv_path', csv_path,
               '--visualization', 'no'])
    out = os.path.join(run_folder, 'dvc_results.json')
    assert os.path.exists(out)
    with open(out) as f:
        res = json.load(f)
    assert set(res['results']) == set(keys)
