#!/usr/bin/env python
"""Evaluation / inference driver (reference ``eval.py:38-176``).

    python eval.py --cfg_path cfgs/yc2_tsp_pdvc.yml \
        --eval_save_dir save/yc2_tsp_pdvc --eval_mode eval

``--eval_mode test`` runs on unlabeled videos: a fake caption file is built
from the available features so the full pipeline runs end-to-end
(reference ``eval.py:29-36`` create_fake_test_caption_file), and language
metrics are skipped.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def create_fake_test_caption_file(metadata_keys, out_path, duration=60.0):
    """Fake annotation so the full pipeline runs on unlabeled videos
    (reference eval.py:29-36).  ``metadata_keys`` is a list of video keys
    or the path of a metadata CSV (the reference surface): then keys and
    durations come from its filename / video-duration columns."""
    if isinstance(metadata_keys, str):
        import csv
        with open(metadata_keys) as f:
            rows = list(csv.DictReader(f))
        fake = {os.path.basename(r['filename']).split('.')[0]:
                {'duration': float(r.get('video-duration', duration)),
                 'timestamps': [[0, 0.5]], 'sentences': ['None']}
                for r in rows}
    else:
        fake = {k: {'duration': duration, 'timestamps': [[0, 0.5]],
                    'sentences': ['None']} for k in metadata_keys}
    with open(out_path, 'w') as f:
        json.dump(fake, f)
    return out_path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_path', type=str, default=None)
    parser.add_argument('--eval_save_dir', type=str, default='save',
                        help='run folder (or its parent when --eval_folder '
                             'is given, the reference layout)')
    parser.add_argument('--eval_folder', type=str, default=None,
                        help='run folder name under --eval_save_dir '
                             '(reference eval.py:161)')
    parser.add_argument('--eval_mode', type=str, default='eval',
                        choices=['eval', 'test'])
    parser.add_argument('--eval_model', type=str, default='best',
                        choices=['best', 'last'])
    parser.add_argument('--eval_caption_file', type=str, default=None)
    parser.add_argument('--eval_feature_folder',
                        '--test_video_feature_folder',
                        dest='eval_feature_folder', type=str, nargs='+',
                        default=None)
    parser.add_argument('--test_video_meta_data_csv_path', type=str,
                        default=None,
                        help='test mode: build the fake caption file from '
                             'this metadata CSV (reference surface)')
    parser.add_argument('--eval_batch_size', type=int, default=None)
    parser.add_argument('--eval_checkpoint_path', '--eval_model_path',
                        dest='eval_checkpoint_path', type=str, default=None,
                        help='explicit checkpoint path; supports flax '
                             '.ckpt/.orbax and reference torch '
                             'PDVC/NewModel .pth')
    parser.add_argument('--eval_transformer_input_type', type=str,
                        default=None, choices=['queries', 'gt_proposals'],
                        help='override the restored transformer_input_type '
                             '(reference eval.py:61)')
    parser.add_argument('--eval_tool_version', type=str, default=None,
                        choices=['2018', '2021'])
    parser.add_argument('--skip_lang_eval', action='store_true')
    # reference flags with no TPU meaning — accepted so reference command
    # lines run unchanged (device selection is JAX_PLATFORMS here;
    # visualization='yes' only redirected the reference's hard-coded
    # feature paths, which --eval_feature_folder does explicitly)
    parser.add_argument('--gpu_id', type=str, nargs='+', default=None)
    parser.add_argument('--eval_device', type=str, default=None)
    parser.add_argument('--eval_proposal_type', type=str, default=None)
    parser.add_argument('--visualization', type=str, default=None)
    args = parser.parse_args()
    for flag in ('gpu_id', 'eval_device', 'eval_proposal_type',
                 'visualization'):
        if getattr(args, flag) is not None:
            print(f'--{flag} accepted for reference compatibility; '
                  'no effect on the TPU build (see PARITY.md)')
    if args.eval_folder:
        args.eval_save_dir = os.path.join(args.eval_save_dir,
                                          args.eval_folder)
        if args.eval_mode == 'test':
            os.makedirs(args.eval_save_dir, exist_ok=True)

    from dvc_tpu.data import BatchLoader, DenseCaptionDataset
    from dvc_tpu.eval import evaluate
    from dvc_tpu.train import Trainer, load_info_json
    from dvc_tpu.utils.config import load_config
    from dvc_tpu.utils.logging import create_logger

    logger = create_logger(args.eval_save_dir, 'eval.log')

    # restore options from the run's info.json (reference eval.py:53-59);
    # with --eval_model_path pointing outside the run folder, the info.json
    # next to the checkpoint is the fallback (reference eval.py:44-49)
    info = load_info_json(args.eval_save_dir)
    if info is None and args.eval_checkpoint_path:
        info = load_info_json(os.path.dirname(args.eval_checkpoint_path))
    if info is not None:
        opt = load_config(**info[args.eval_model]['opt'])
    elif args.cfg_path:
        opt = load_config(args.cfg_path)
    else:
        raise SystemExit('need info.json in the run folder (or next to '
                         '--eval_model_path) or --cfg_path')
    if args.eval_transformer_input_type:
        opt.transformer_input_type = args.eval_transformer_input_type
    if args.eval_tool_version:
        opt.eval_tool_version = args.eval_tool_version

    caption_file = args.eval_caption_file or opt.val_caption_file
    if args.eval_mode == 'test' and args.test_video_meta_data_csv_path:
        caption_file = create_fake_test_caption_file(
            args.test_video_meta_data_csv_path,
            os.path.join(args.eval_save_dir, 'fake_caption.json'))
    feature_folder = args.eval_feature_folder or opt.visual_feature_folder
    if args.eval_feature_folder:
        ff = args.eval_feature_folder                     # nargs='+': a list
        if isinstance(opt.visual_feature_type, (list, tuple)):
            feature_folder = (ff if len(ff) == len(opt.visual_feature_type)
                              else [ff[0]] * len(opt.visual_feature_type))
        else:
            feature_folder = ff[0]
    skip_lang = args.skip_lang_eval or args.eval_mode == 'test'

    fusion = bool(getattr(opt, 'sound_feature_folder', None))
    if fusion:
        from dvc_tpu.data.fusion_dataset import (FusionBatchLoader,
                                                 FusionDataset)
        from newTrain import make_fusion_trainer
        ds = FusionDataset(caption_file, feature_folder, opt.dict_file,
                           is_training=False, opt=opt)
        loader = FusionBatchLoader(
            ds, args.eval_batch_size or opt.batch_size_for_eval,
            shuffle=False, opt=opt)
        trainer = make_fusion_trainer(opt)
    elif getattr(opt, 'streaming_features', 0) and not args.eval_feature_folder:
        # streaming-trained runs evaluate the same way: decode + TSP in
        # process, no feature files (dvc_tpu/data/streaming.py); passing
        # --eval_feature_folder overrides back to the file path
        from dvc_tpu.data.streaming import StreamingFeatureDataset
        ds = StreamingFeatureDataset(
            caption_file, opt.video_folder, opt.dict_file,
            is_training=False, opt=opt,
            cache_size=getattr(opt, 'streaming_cache', 4096))
        loader = BatchLoader(ds,
                             args.eval_batch_size or opt.batch_size_for_eval,
                             shuffle=False, opt=opt)
        trainer = Trainer(opt)
    else:
        ds = DenseCaptionDataset(caption_file, feature_folder, opt.dict_file,
                                 is_training=False, opt=opt)
        loader = BatchLoader(ds,
                             args.eval_batch_size or opt.batch_size_for_eval,
                             shuffle=False, opt=opt)
        trainer = Trainer(opt)
    ck_path = args.eval_checkpoint_path or os.path.join(
        args.eval_save_dir, f'model-{args.eval_model}.ckpt')
    batch0, _ = next(iter(loader))
    # shape-only init: restoring a checkpoint needs the param-tree skeleton,
    # not a compiled model init (minutes on a 1-core host, all discarded)
    state, ck = trainer.eval_state_from_checkpoint(batch0, ck_path)
    logger.info(f'loaded {ck_path} (epoch {ck["epoch"]})')

    # reference naming: test mode writes dvc_results.json (eval.py:135,
    # the file test_and_visualize.sh feeds to the visualizer)
    name = ('dvc_results.json' if args.eval_mode == 'test'
            else 'eval_results.json')
    dvc_json_path = os.path.join(args.eval_save_dir, name)
    scores, eval_loss = evaluate(
        trainer, state, loader, dvc_json_path, logger=logger,
        alpha=opt.ec_alpha, dvc_eval_version=opt.eval_tool_version,
        skip_lang_eval=skip_lang)
    if scores is not None:
        logger.info('scores:')
        for k, v in scores.items():
            logger.info(f'  {k}: {v}')
    logger.info(f'results written to {dvc_json_path}')


if __name__ == '__main__':
    main()
