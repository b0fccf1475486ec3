"""Full-driver integration: train.py's train() on synthetic data with
per-epoch metric evaluation and checkpoint/info.json outputs."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synth import make_synth_dataset

pytestmark = pytest.mark.heavy


@pytest.fixture(scope='module')
def synth_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('driver'))
    anno, feats, vocab, vsize = make_synth_dataset(root)
    # paragraph gt derived from the same annotations
    with open(anno) as f:
        a = json.load(f)
    para_path = os.path.join(root, 'para.json')
    with open(para_path, 'w') as f:
        json.dump({k: '. '.join(v['sentences']) for k, v in a.items()}, f)
    return root, anno, feats, vocab, vsize, para_path


def test_train_driver_end_to_end(synth_env, tmp_path):
    root, anno, feats, vocab, vsize, para = synth_env
    from dvc_tpu.utils.config import load_config
    from train import train

    opt = load_config(
        id='synth_run', save_dir=str(tmp_path / 'save'), seed=7,
        train_caption_file=anno, val_caption_file=anno,
        gt_file_for_eval=[anno], gt_file_for_para_eval=[para],
        dict_file=vocab, vocab_size=vsize,
        visual_feature_type='tsp', visual_feature_folder=feats,
        feature_dim=16, frame_embedding_num=24, gt_proposal_sample_num=4,
        max_caption_len=10, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=2, transformer_ff_dim=64, num_queries=10,
        input_encoding_size=32, rnn_size=64, att_hid_size=0,
        with_box_refine=True, caption_decoder_type='light',
        caption_loss_coef=1.0, count_loss_coef=0.5, batch_size=3,
        lr=1e-3, epoch=2, save_checkpoint_every=1, max_eseq_length=10,
        learning_rate_decay_start=1, learning_rate_decay_every=1,
        learning_rate_decay_rate=0.5, msda_impl='ref', invalid_video_json=[],
        start_from='', pretrain=None, debug=False, ec_alpha=0.3,
        criteria_for_best_ckpt='dvc', eval_tool_version='2018',
        batch_size_for_eval=3, min_epoch_when_save=-1,
        save_all_checkpoint=False, random_seed=False)
    save_folder = train(opt)

    assert os.path.exists(os.path.join(save_folder, 'model-last.ckpt'))
    assert os.path.exists(os.path.join(save_folder, 'model-best.ckpt'))
    info_path = os.path.join(save_folder, 'info.json')
    assert os.path.exists(info_path)
    with open(info_path) as f:
        info = json.load(f)
    assert info['best_val_score'] > -1e9
    assert 'val_history' in info and len(info['val_history']) >= 1
    # the per-epoch dvc json exists and has the protocol fields
    epoch_jsons = [f for f in os.listdir(save_folder)
                   if f.startswith('epoch') and f.endswith('.json')
                   and 'rerank' not in f]
    assert epoch_jsons
    with open(os.path.join(save_folder, sorted(epoch_jsons)[0])) as f:
        dvc = json.load(f)
    assert 'results' in dvc and len(dvc['results']) > 0
    first = next(iter(dvc['results'].values()))[0]
    assert {'timestamp', 'sentence', 'proposal_score'} <= set(first)
    # metric scores were appended to the json
    assert 'METEOR' in dvc and 'soda_c' in dvc


def test_train_driver_steps_per_dispatch(synth_env, tmp_path):
    """K>1 optimizer steps per dispatch through the driver loop."""
    root, anno, feats, vocab, vsize, para = synth_env
    from dvc_tpu.utils.config import load_config
    from train import train

    opt = load_config(
        id='synth_k2', save_dir=str(tmp_path / 'save'), seed=7,
        train_caption_file=anno, val_caption_file=anno,
        gt_file_for_eval=[anno], gt_file_for_para_eval=[para],
        dict_file=vocab, vocab_size=vsize,
        visual_feature_type='tsp', visual_feature_folder=feats,
        feature_dim=16, frame_embedding_num=24, gt_proposal_sample_num=4,
        max_caption_len=10, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=2, transformer_ff_dim=64, num_queries=10,
        input_encoding_size=32, rnn_size=64, att_hid_size=0,
        with_box_refine=True, caption_decoder_type='light',
        caption_loss_coef=1.0, count_loss_coef=0.5, batch_size=3,
        lr=1e-3, epoch=1, save_checkpoint_every=1, max_eseq_length=10,
        msda_impl='ref', invalid_video_json=[], steps_per_dispatch=2,
        batch_size_for_eval=3)
    save_folder = train(opt)
    assert os.path.exists(os.path.join(save_folder, 'model-last.ckpt'))


def test_train_driver_resume(synth_env, tmp_path):
    """start_from resumes epoch count and optimizer state."""
    root, anno, feats, vocab, vsize, para = synth_env
    from dvc_tpu.utils.config import load_config
    from train import train

    kw = dict(
        save_dir=str(tmp_path / 'save'), seed=7,
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
        lr=1e-3, save_checkpoint_every=1, max_eseq_length=10,
        msda_impl='ref', invalid_video_json=[], batch_size_for_eval=3)
    opt = load_config(id='resume_run', epoch=1, **kw)
    save_folder = train(opt)
    # resume for one more epoch
    opt2 = load_config(id='resume_run', epoch=2, start_from='resume_run',
                       start_from_mode='last', **kw)
    save_folder2 = train(opt2)
    assert save_folder2 == save_folder
    from dvc_tpu.train import load_checkpoint
    ck = load_checkpoint(os.path.join(save_folder, 'model-last.ckpt'))
    assert ck['epoch'] == 2
