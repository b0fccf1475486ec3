"""Mixed-precision (bf16 trunk) numerics: same params, loss close to f32."""
import jax
import numpy as np

from dvc_tpu.models import PDVC, PDVCConfig, build_weight_dict
from test_model import make_batch, tiny_opt
import pytest

pytestmark = pytest.mark.heavy


def test_bf16_loss_close_to_f32():
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    losses = {}
    params32 = None
    for dt in ('float32', 'bfloat16'):
        opt = tiny_opt(tpu_compute_dtype=dt)
        model = PDVC(PDVCConfig.from_opt(opt))
        if params32 is None:
            params32 = model.init({'params': jax.random.PRNGKey(0)},
                                  batch, eval_mode=True)
        out, l = model.apply(params32, batch, eval_mode=True)
        wd = build_weight_dict(opt)
        losses[dt] = sum(float(l[k]) * w for k, w in wd.items() if k in l)
        assert np.isfinite(losses[dt])
    rel = abs(losses['bfloat16'] - losses['float32']) / abs(losses['float32'])
    assert rel < 0.05, losses


def _run_extraction(vid_dir, out_dir, dtype):
    import importlib.util
    import os
    import sys
    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        'extract_features_mod', os.path.join(ROOT, 'extract_features.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = ['extract_features.py', '--video-dir', str(vid_dir),
            '--backbone', 'r3d_18', '--clip-len', '4', '--frame-rate', '15',
            '--stride', '16', '--batch-size', '4',
            '--output-dir', str(out_dir), '--dtype', dtype]
    old = sys.argv
    try:
        sys.argv = argv
        mod.main()
    finally:
        sys.argv = old


def test_bf16_extraction_preserves_downstream_metrics(tmp_path):
    """The extraction default is bfloat16 (extract_features.py --dtype);
    this justifies it end-to-end: features extracted in bf16 vs f32 from
    the same videos + the same trained PDVC must (a) agree to ~1% relative
    error and (b) produce downstream dvc metrics within tight bounds.
    """
    import json

    import cv2  # noqa: F401  (skip if absent)
    import jax
    import numpy as np
    pytest.importorskip('cv2')

    from dvc_tpu.data import BatchLoader, DenseCaptionDataset
    from dvc_tpu.eval.eval_utils import evaluate
    from dvc_tpu.train import Trainer, multistep_lr
    from dvc_tpu.utils.config import load_config

    # --- synthesize videos with phase-structured content ---------------
    vid_dir = tmp_path / 'videos'
    vid_dir.mkdir()
    rng = np.random.default_rng(0)
    n_videos, fps, n_frames = 3, 15.0, 96
    anno = {}
    for v in range(n_videos):
        key = f'v_bf16test{v:04d}'
        path = str(vid_dir / f'{key}.mp4')
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), fps,
                            (64, 48))
        duration = n_frames / fps
        # two visually distinct phases per video
        spans = [(0.1, 0.4), (0.55, 0.9)]
        sents = ['stir the pot', 'chop the onion']
        ts = []
        for i in range(n_frames):
            frame = rng.integers(0, 40, (48, 64, 3)).astype(np.uint8)
            t = i / n_frames
            for si, (a, b) in enumerate(spans):
                if a <= t < b:
                    frame[:, :, si] += 150          # phase signature
            w.write(frame)
        w.release()
        ts = [[a * duration, b * duration] for a, b in spans]
        anno[key] = {'duration': duration, 'timestamps': ts,
                     'sentences': sents}
    anno_path = str(tmp_path / 'anno.json')
    with open(anno_path, 'w') as f:
        json.dump(anno, f)
    para_path = str(tmp_path / 'para.json')
    with open(para_path, 'w') as f:
        json.dump({k: '. '.join(v['sentences']) for k, v in anno.items()},
                  f)
    words = sorted({w for v in anno.values()
                    for s in v['sentences'] for w in s.split()}) + ['UNK']
    vocab_path = str(tmp_path / 'vocab.json')
    with open(vocab_path, 'w') as f:
        json.dump({'ix_to_word': {str(i + 1): w
                                  for i, w in enumerate(words)},
                   'word_to_ix': {w: i + 1 for i, w in enumerate(words)}},
                  f)

    # --- extract features in f32 and bf16 (identical PRNGKey(0) weights)
    f32_dir, bf16_dir = tmp_path / 'f32', tmp_path / 'bf16'
    _run_extraction(vid_dir, f32_dir, 'float32')
    _run_extraction(vid_dir, bf16_dir, 'bfloat16')
    rels = []
    for key in anno:
        a = np.load(f32_dir / f'{key[:13]}.npy')
        b = np.load(bf16_dir / f'{key[:13]}.npy')
        assert a.shape == b.shape
        rels.append(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9))
    assert max(rels) < 0.02, rels       # bf16 features ~1% off f32

    # --- train one PDVC briefly on the f32 features --------------------
    opt = load_config(
        vocab_size=len(words), visual_feature_type='tsp', feature_dim=512,
        frame_embedding_num=8, gt_proposal_sample_num=2, max_caption_len=6,
        invalid_video_json=[], hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=2, transformer_ff_dim=64, num_queries=8,
        input_encoding_size=32, rnn_size=64, att_hid_size=0,
        with_box_refine=True, caption_decoder_type='light',
        caption_loss_coef=2.0, count_loss_coef=0.5, batch_size=3,
        lr=1e-3, epoch=12, msda_impl='ref', max_eseq_length=5,
        train_caption_file=anno_path, val_caption_file=anno_path,
        gt_file_for_eval=[anno_path], gt_file_for_para_eval=[para_path],
        dict_file=vocab_path)
    ds32 = DenseCaptionDataset(anno_path, str(f32_dir), vocab_path, True,
                               opt)
    loader32 = BatchLoader(ds32, opt.batch_size, shuffle=True, opt=opt)
    trainer = Trainer(opt)
    batch0, _ = next(iter(loader32))
    state = trainer.init_state(batch0)
    rng_t = jax.random.PRNGKey(0)
    for epoch in range(opt.epoch):
        lr = multistep_lr(opt, epoch)
        for batch, meta in loader32:
            rng_t, r = jax.random.split(rng_t)
            state, _ = trainer.train_step(state, batch, lr, 0.0, r)

    # --- evaluate the SAME weights on f32 vs bf16 features -------------
    scores = {}
    for tag, fdir in (('f32', f32_dir), ('bf16', bf16_dir)):
        ds = DenseCaptionDataset(anno_path, str(fdir), vocab_path, False,
                                 opt)
        loader = BatchLoader(ds, opt.batch_size, shuffle=False, opt=opt,
                             drop_last=False)
        s, _ = evaluate(trainer, state, loader,
                        str(tmp_path / f'dvc_{tag}.json'))
        scores[tag] = s
    for metric, bound in (('METEOR', 0.02), ('soda_c', 0.02),
                          ('CIDEr', 0.05), ('Recall', 0.13),
                          ('Precision', 0.13)):
        d = abs(scores['f32'][metric] - scores['bf16'][metric])
        assert d <= bound, (metric, scores['f32'][metric],
                            scores['bf16'][metric])
