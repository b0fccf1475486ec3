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
    fake = {k: {'duration': duration, 'timestamps': [[0, 0.5]],
                'sentences': ['None']} for k in metadata_keys}
    with open(out_path, 'w') as f:
        json.dump(fake, f)
    return out_path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_path', type=str, default=None)
    parser.add_argument('--eval_save_dir', type=str, required=True,
                        help='run folder with model-{best,last}.ckpt + info.json')
    parser.add_argument('--eval_mode', type=str, default='eval',
                        choices=['eval', 'test'])
    parser.add_argument('--eval_model', type=str, default='best',
                        choices=['best', 'last'])
    parser.add_argument('--eval_caption_file', type=str, default=None)
    parser.add_argument('--eval_feature_folder', type=str, default=None)
    parser.add_argument('--eval_batch_size', type=int, default=None)
    parser.add_argument('--eval_checkpoint_path', type=str, default=None,
                        help='explicit checkpoint path; supports flax '
                             '.ckpt/.orbax and reference torch PDVC .pth')
    parser.add_argument('--skip_lang_eval', action='store_true')
    args = parser.parse_args()

    from dvc_tpu.data import BatchLoader, DenseCaptionDataset
    from dvc_tpu.eval import evaluate
    from dvc_tpu.train import Trainer, load_info_json
    from dvc_tpu.utils.config import load_config
    from dvc_tpu.utils.logging import create_logger

    logger = create_logger(args.eval_save_dir, 'eval.log')

    # restore options from the run's info.json (reference eval.py:53-59)
    info = load_info_json(args.eval_save_dir)
    if info is not None:
        opt = load_config(**info[args.eval_model]['opt'])
    elif args.cfg_path:
        opt = load_config(args.cfg_path)
    else:
        raise SystemExit('need info.json in the run folder or --cfg_path')

    caption_file = args.eval_caption_file or opt.val_caption_file
    feature_folder = args.eval_feature_folder or opt.visual_feature_folder
    if (args.eval_feature_folder
            and isinstance(opt.visual_feature_type, (list, tuple))):
        feature_folder = [args.eval_feature_folder] * len(
            opt.visual_feature_type)
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

    dvc_json_path = os.path.join(
        args.eval_save_dir, f'{args.eval_mode}_results.json')
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
