#!/usr/bin/env python
"""Audio-visual fusion training driver (reference ``newTrain.py:74-544``).

    python newTrain.py --cfg_path cfgs/yc2_newModel_sound.yml

Same loop as train.py, on the FusionPDVC model (visual self-attention +
HuBERT audio cross-attention + PDVC), with the reference's mid-epoch resume:
visited video keys are checkpointed every ``--ckpt_every_batches`` batches
and skipped after a restart (newTrain.py:289-306,404-417).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def make_fusion_trainer(opt, mesh=None):
    from dvc_tpu.models.fusion import make_fusion_model
    from dvc_tpu.train.trainer import Trainer
    return Trainer(opt, mesh=mesh, model=make_fusion_model(opt))


def main(opt):
    import jax

    from dvc_tpu.data.audio import HubertExtractor
    from dvc_tpu.data.fusion_dataset import FusionBatchLoader, FusionDataset
    from dvc_tpu.eval import evaluate
    from dvc_tpu.train import (filtered_restore, load_checkpoint,
                               load_info_json, multistep_lr, save_checkpoint,
                               save_info_json, ss_prob_for_epoch,
                               step_prng_key)
    from dvc_tpu.utils.logging import build_folder, create_logger

    save_folder = build_folder(opt)
    logger = create_logger(save_folder, 'train.log')

    sound_folder = getattr(opt, 'sound_feature_folder', None)
    extractor = HubertExtractor(cache_dir=sound_folder) if sound_folder else None
    train_ds = FusionDataset(opt.train_caption_file, opt.visual_feature_folder,
                             opt.dict_file, True, opt, seed=opt.seed,
                             extractor=extractor)
    val_ds = FusionDataset(opt.val_caption_file, opt.visual_feature_folder,
                           opt.dict_file, False, opt)
    val_loader = FusionBatchLoader(val_ds, opt.batch_size_for_eval, False, opt)

    trainer = make_fusion_trainer(opt)
    visited = set()
    epoch = 0
    best_val_score = -1e9
    # per-epoch eval scores (reference newTrain.py:486 val_result_history)
    val_history = {}

    info = load_info_json(save_folder) if opt.start_from else None
    loader = FusionBatchLoader(train_ds, opt.batch_size, True, opt,
                               seed=opt.seed, skip_keys=visited)
    batch0, _ = next(iter(loader))
    state = trainer.init_state(batch0, seed=opt.seed)

    if opt.pretrain and not opt.start_from:
        logger.info(f'loading pretrained PDVC from {opt.pretrain_path}')
        ck = load_checkpoint(
            opt.pretrain_path,
            flax_params={'params': state['params']['params']['pdvc']})
        # pretrained plain-PDVC params restore under the fusion model's
        # 'pdvc' scope
        pdvc_params = state['params']['params']['pdvc']
        restored = filtered_restore({'params': pdvc_params},
                                    {'params': ck['params'].get(
                                        'params', ck['params'])},
                                    opt.pretrain)
        state['params']['params']['pdvc'] = restored['params']

    if opt.start_from and info is not None:
        path = os.path.join(save_folder, f'model-{opt.start_from_mode}.ckpt')
        ck = load_checkpoint(path)
        state['params'] = ck['params']
        state['opt_state'] = ck['opt_state']
        epoch = ck['epoch']
        visited = set(ck.get('visited_videos', []))
        best_val_score = info.get('best_val_score', -1e9)
        val_history = info.get('val_history', {})
        logger.info(f'resumed epoch {epoch}, {len(visited)} videos visited')

    rng = step_prng_key(opt, opt.seed)
    ckpt_every = getattr(opt, 'ckpt_every_batches', 100)
    while epoch < opt.epoch:
        lr = multistep_lr(opt, epoch)
        ss_prob = ss_prob_for_epoch(opt, epoch)
        loader = FusionBatchLoader(train_ds, opt.batch_size, True, opt,
                                   seed=opt.seed + epoch, skip_keys=visited)
        if getattr(opt, 'device_prefetch', 1):
            from dvc_tpu.data.prefetch import DevicePrefetchLoader
            loader = DevicePrefetchLoader(loader, trainer.prepare_batch)
        n, loss_sum, t0 = 0, {}, time.time()
        for batch, meta in loader:
            if opt.debug and n >= 5:
                break
            rng, r = jax.random.split(rng)
            state, losses = trainer.train_step(state, batch, lr, ss_prob, r)
            visited.update(meta['keys'])
            for k, v in losses.items():
                loss_sum[k] = loss_sum.get(k, 0.0) + float(v)
            n += 1
            if n % ckpt_every == 0:
                save_checkpoint(save_folder, 'last', state, epoch,
                                extra={'visited_videos': sorted(visited)})
        visited.clear()  # full epoch done
        loss_avg = {k: round(v / max(n, 1), 3) for k, v in loss_sum.items()}
        logger.info(f'epoch {epoch}: {loss_avg} ({time.time() - t0:.1f}s)')
        epoch += 1

        if epoch % opt.save_checkpoint_every == 0:
            dvc_json_path = os.path.join(save_folder, f'epoch{epoch}.json')
            try:
                scores, _ = evaluate(trainer, state, val_loader,
                                     dvc_json_path, logger=logger,
                                     alpha=opt.ec_alpha,
                                     dvc_eval_version=opt.eval_tool_version,
                                     debug=opt.debug)
            except FileNotFoundError as e:
                logger.warning(f'skipping metric eval: {e}')
                scores = None
            if scores is not None:
                current = scores.get('METEOR', 0) + scores.get('soda_c', 0)
                val_history[epoch] = {k: float(v) for k, v in scores.items()
                                      if np.isscalar(v)}
                if current > best_val_score:
                    best_val_score = current
                    save_checkpoint(save_folder, 'best', state, epoch)
            save_checkpoint(save_folder, 'last', state, epoch)
            save_info_json(save_folder, {
                'best_val_score': best_val_score,
                'val_history': val_history,
                'last': {'epoch': epoch, 'opt': opt.to_dict()},
                'best': {'epoch': epoch, 'opt': opt.to_dict()}})
    logger.info('Training done.')


if __name__ == '__main__':
    from dvc_tpu.utils.config import parse_opts
    opt = parse_opts()
    np.random.seed(opt.seed)
    main(opt)
