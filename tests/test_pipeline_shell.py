"""Whole own-video pipeline: test_and_visualize.sh on a synthesized video
with a tiny trained model (r3d_18 extraction backbone on CPU)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_full_shell_pipeline(tmp_path):
    # 1. a tiny trained model over 512-d features (r3d_18 feature size)
    from synth import make_synth_dataset
    from dvc_tpu.utils.config import load_config
    from train import train
    anno, feats, vocab, vsize = make_synth_dataset(
        str(tmp_path), feat_dim=512)
    opt = load_config(
        id='shellrun', save_dir=str(tmp_path / 'save'), seed=5,
        train_caption_file=anno, val_caption_file=anno,
        gt_file_for_eval=[anno], gt_file_for_para_eval=[],
        dict_file=vocab, vocab_size=vsize,
        visual_feature_type='tsp', visual_feature_folder=feats,
        feature_dim=512, frame_embedding_num=16, gt_proposal_sample_num=3,
        max_caption_len=8, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=1, transformer_ff_dim=64, num_queries=6,
        input_encoding_size=32, rnn_size=64, att_hid_size=0,
        with_box_refine=True, caption_decoder_type='light',
        caption_loss_coef=1.0, count_loss_coef=0.5, batch_size=3,
        lr=1e-3, epoch=1, save_checkpoint_every=1, max_eseq_length=5,
        msda_impl='ref', invalid_video_json=[], batch_size_for_eval=3)
    run_folder = train(opt)

    # 2. a synthesized input video
    vid_dir = tmp_path / 'videos'
    vid_dir.mkdir()
    vp = str(vid_dir / 'v_shell000001.mp4')
    w = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*'mp4v'), 30.0, (64, 48))
    for i in range(150):
        w.write(np.full((48, 64, 3), (i * 3) % 255, np.uint8))
    w.release()

    # 3. the shell pipeline with the CPU-friendly backbone
    out_dir = tmp_path / 'out'
    env = dict(os.environ)
    env.update(BACKBONE='r3d_18', CLIP_LEN='4', STRIDE='16',
               EVAL_MODEL='last',
               # hermetic: the pipeline subprocesses must not depend on the
               # box's TPU tunnel being up — skip the axon PJRT plugin
               # registration (sitecustomize gates on this var) and run the
               # whole CPU-friendly pipeline on the host backend
               PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu')
    r = subprocess.run(
        ['bash', os.path.join(ROOT, 'test_and_visualize.sh'),
         str(vid_dir), str(out_dir), run_folder],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, r.stdout[-3000:] + '\n' + r.stderr[-3000:]

    # outputs: metadata csv, features, dvc json, rendered video
    assert (out_dir / 'metadata.csv').exists()
    assert (out_dir / 'features' / 'v_shell000001.npy').exists() or \
        (out_dir / 'features' / 'v_shell000001'[:13]).exists() or \
        any(f.endswith('.npy') for f in os.listdir(out_dir / 'features'))
    results_path = os.path.join(run_folder, 'dvc_results.json')
    assert os.path.exists(results_path)
    with open(results_path) as f:
        res = json.load(f)
    assert len(res['results']) == 1
    rendered = list((out_dir / 'videos').glob('*.mp4'))
    assert rendered, 'caption overlay mp4 must be rendered'
