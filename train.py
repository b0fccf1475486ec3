#!/usr/bin/env python
"""Feature-mode training driver (reference ``train.py:32-317``).

    python train.py --cfg_path cfgs/yc2_tsp_pdvc.yml

Per epoch: scheduled-sampling update, compiled train steps, then validation
through the dense-captioning metric stack; model-best selection by
METEOR + soda_c (criteria 'dvc') or the paragraph metrics ('pc'), last/best
checkpoints + info.json with full option dict and histories.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def train(opt):
    import jax

    from dvc_tpu.data import BatchLoader, DenseCaptionDataset
    from dvc_tpu.eval import evaluate
    from dvc_tpu.train import (Trainer, filtered_restore, load_checkpoint,
                               load_info_json, multistep_lr, save_checkpoint,
                               save_info_json, ss_prob_for_epoch, step_prng_key)
    from dvc_tpu.utils.logging import (MetricsWriter, backup_environment,
                                       build_folder, create_logger,
                                       print_opt)

    save_folder = build_folder(opt)
    logger = create_logger(save_folder, 'train.log')
    metrics = MetricsWriter(save_folder)
    backup_environment(save_folder, os.path.dirname(os.path.abspath(__file__)))
    logger.info(f'save folder: {save_folder}')

    epoch = 0
    best_val_score = -1e9
    best_epoch = 0
    val_history, loss_history = {}, {}

    if opt.start_from:
        info = load_info_json(save_folder)
        if info is not None:
            prev = info.get(opt.start_from_mode, {})
            epoch = prev.get('epoch', 0)
            best_val_score = info.get('best_val_score', -1e9)
            best_epoch = info.get('best', {}).get('epoch', epoch)
            logger.info(f'resuming from epoch {epoch}')

    if getattr(opt, 'streaming_features', 0):
        # decode -> TSP features -> train in one process, no .npy round
        # trip (the reference's ete path shells out to the extractor and
        # re-reads files, ete/eval.py:144-194)
        from dvc_tpu.data.streaming import StreamingFeatureDataset
        if not opt.video_folder:
            raise ValueError('--streaming_features requires --video_folder')
        train_dataset = StreamingFeatureDataset(
            opt.train_caption_file, opt.video_folder, opt.dict_file,
            is_training=True, opt=opt, seed=opt.seed,
            cache_size=opt.streaming_cache)
        # eval shares the extractor (and its cache) with training
        val_dataset = StreamingFeatureDataset(
            opt.val_caption_file, opt.video_folder, opt.dict_file,
            is_training=False, opt=opt, seed=opt.seed,
            extractor=train_dataset.extractor,
            cache_size=opt.streaming_cache)
    else:
        train_dataset = DenseCaptionDataset(
            opt.train_caption_file, opt.visual_feature_folder, opt.dict_file,
            is_training=True, opt=opt, seed=opt.seed)
        val_dataset = DenseCaptionDataset(
            opt.val_caption_file, opt.visual_feature_folder, opt.dict_file,
            is_training=False, opt=opt, seed=opt.seed)
    # per-host input sharding (DistributedSampler equivalent): on a
    # jax.distributed multi-host runtime each host feeds its own slice
    pidx, pcnt = ((jax.process_index(), jax.process_count())
                  if jax.process_count() > 1 else (None, None))
    train_loader = BatchLoader(train_dataset, opt.batch_size, shuffle=True,
                               opt=opt, seed=opt.seed,
                               process_index=pidx, process_count=pcnt)
    val_loader = BatchLoader(val_dataset, opt.batch_size_for_eval,
                             shuffle=False, opt=opt)

    trainer = Trainer(opt)
    batch0, _ = next(iter(train_loader))
    state = trainer.init_state(batch0, seed=opt.seed)
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree_util.tree_leaves(state['params']))
    logger.info(f'model parameters: {n_params / 1e6:.2f}M')

    if opt.pretrain and not opt.start_from:
        logger.info(f'loading pretrained ({opt.pretrain}) from '
                    f'{opt.pretrain_path}')
        ck = load_checkpoint(opt.pretrain_path, flax_params=state['params'])
        state['params'] = filtered_restore(state['params'], ck['params'],
                                           opt.pretrain)

    if opt.start_from:
        mode = opt.start_from_mode
        path = os.path.join(save_folder, f'model-{mode}.ckpt')
        ck = load_checkpoint(path)
        state['params'] = ck['params']
        state['opt_state'] = ck['opt_state']
        state['step'] = ck.get('step', 0)
        epoch = ck['epoch']

    print_opt(opt, logger)
    logger.info('Start training!')

    # observability: set DVC_PROFILE_DIR to capture an XLA trace of the
    # first training steps (TPU superset of the reference's wall-clock
    # time/iter logging, SURVEY.md §5)
    profile_dir = os.environ.get('DVC_PROFILE_DIR')
    profile_steps = int(os.environ.get('DVC_PROFILE_STEPS', '10'))

    rng = step_prng_key(opt, opt.seed)
    iteration = 0
    while epoch < opt.epoch:
        train_loader.set_epoch(epoch)   # reseeds the (host-shared) shuffle
        ss_prob = ss_prob_for_epoch(opt, epoch)
        lr = multistep_lr(opt, epoch)
        logger.info(f'epoch {epoch} lr {lr:.2e} ss_prob {ss_prob:.3f}')
        loss_sum = {}
        t0 = time.time()
        n = 0
        K = max(int(getattr(opt, 'steps_per_dispatch', 1)), 1)
        pending = []
        from dvc_tpu.data.prefetch import DevicePrefetchLoader, PrefetchLoader
        if K == 1 and getattr(opt, 'device_prefetch', 1):
            # double-buffer: next batch's device_put overlaps this step
            loader_iter = DevicePrefetchLoader(train_loader,
                                               trainer.prepare_batch)
        else:
            if K > 1 and getattr(opt, 'device_prefetch', 1) and epoch == 0:
                logger.info('steps_per_dispatch>1: K batches are stacked '
                            'and shipped per dispatch; device_prefetch '
                            'lookahead does not apply')
            loader_iter = PrefetchLoader(train_loader)
        for batch, meta in loader_iter:
            if opt.debug and n >= 5:
                break
            rng, step_rng = jax.random.split(rng)
            if profile_dir and iteration == 1:
                jax.profiler.start_trace(profile_dir)
            if K > 1:
                pending.append(batch)
                if len(pending) < K:
                    continue
                state, stacked = trainer.train_steps(state, pending, lr,
                                                     ss_prob, step_rng)
                # sum over the K scanned steps; the epoch average divides
                # by the total step count n
                losses = {k: float(np.asarray(v).sum())
                          for k, v in stacked.items()}
                pending = []
                n += K - 1
                iteration += K - 1
            else:
                state, losses = trainer.train_step(state, batch, lr,
                                                   ss_prob, step_rng)
            if profile_dir and iteration >= 1 + profile_steps:
                jax.block_until_ready(losses['total_loss'])
                jax.profiler.stop_trace()
                logger.info(f'profiler trace written to {profile_dir}')
                profile_dir = None
            for k, v in losses.items():
                loss_sum[k] = loss_sum.get(k, 0.0) + float(v)
            iteration += 1
            n += 1
        # flush any trailing batches left when K>1 and the epoch length is
        # not a multiple of K (otherwise they'd be silently dropped)
        for batch in pending:
            rng, step_rng = jax.random.split(rng)
            state, losses = trainer.train_step(state, batch, lr,
                                               ss_prob, step_rng)
            for k, v in losses.items():
                loss_sum[k] = loss_sum.get(k, 0.0) + float(v)
            iteration += 1
            n += 1
        pending = []
        dt = time.time() - t0
        loss_avg = {k: round(v / max(n, 1), 3) for k, v in loss_sum.items()}
        if jax.process_count() > 1:
            # cross-host metric allreduce (the reference's
            # synchronize_between_processes — SURVEY.md §2.9)
            from dvc_tpu.parallel.multihost import sync_metrics
            loss_avg = sync_metrics(loss_avg)
        vps = n * opt.batch_size / max(dt, 1e-9)
        logger.info(f'epoch {epoch}: {loss_avg}, {dt:.1f}s '
                    f'({vps:.2f} videos/s)')
        loss_history[epoch] = loss_avg
        metrics.add_scalar('lr', lr, iteration)
        metrics.add_scalar('videos_per_sec', vps, iteration)
        for k, v in loss_avg.items():
            metrics.add_scalar(f'train/{k}', v, iteration)

        epoch += 1
        # ---------------- evaluation + checkpointing ----------------
        if epoch % opt.save_checkpoint_every == 0 and \
                epoch >= opt.min_epoch_when_save:
            dvc_json_path = os.path.join(
                save_folder, f'epoch{epoch}.json')
            try:
                scores, eval_loss = evaluate(
                    trainer, state, val_loader, dvc_json_path, logger=logger,
                    alpha=opt.ec_alpha,
                    dvc_eval_version=opt.eval_tool_version,
                    debug=opt.debug)
            except FileNotFoundError as e:
                logger.warning(f'skipping metric eval (missing gt): {e}')
                scores = None
            if scores is not None:
                if opt.criteria_for_best_ckpt == 'dvc':
                    current = (scores.get('METEOR', 0)
                               + scores.get('soda_c', 0))
                else:
                    current = (scores.get('para_METEOR', 0)
                               + scores.get('para_CIDEr', 0)
                               + scores.get('para_Bleu_4', 0))
                val_history[epoch] = {k: float(v)
                                      for k, v in scores.items()}
                for k, v in scores.items():
                    metrics.add_scalar(f'val/{k}', v, iteration)
                logger.info(f'epoch {epoch} val score {current:.4f} '
                            f'(best {best_val_score:.4f})')
                if current > best_val_score:
                    best_val_score = current
                    best_epoch = epoch
                    save_checkpoint(save_folder, 'best', state, epoch)
                    logger.info('new best checkpoint saved')
            save_checkpoint(save_folder, 'last', state, epoch)
            if opt.save_all_checkpoint:
                save_checkpoint(save_folder, f'epoch{epoch}', state, epoch)
            info = {
                'best_val_score': best_val_score,
                'last': {'epoch': epoch, 'opt': opt.to_dict()},
                'best': {'epoch': best_epoch, 'opt': opt.to_dict()},
                'val_history': val_history,
                'loss_history': loss_history,
            }
            save_info_json(save_folder, info)

    logger.info('Training done.')
    return save_folder


if __name__ == '__main__':
    from dvc_tpu.utils.config import parse_opts
    opt = parse_opts()
    np.random.seed(opt.seed)
    train(opt)
