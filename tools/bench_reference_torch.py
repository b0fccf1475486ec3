#!/usr/bin/env python
"""Measured same-box anchor for bench.py's baseline denominator.

BENCHMARKS.md documents `vs_baseline` against a *nominal* 10 videos/s
A100-class estimate of the reference's torch loop (the reference
publishes no throughput numbers — SURVEY.md §6).  This tool replaces
estimation with measurement where measurement is possible on this box:

1. the REFERENCE torch PDVC train step — forward + weighted loss +
   backward + grad-clip + Adam, exactly the reference loop
   (/root/reference/train.py:173-187) — at the flagship
   yc2_newModel_sound model shape, batch_size=1 (the reference's own
   batch size: its LSTM-DSA caption path asserts one video per step,
   reference opts.py:102, LSTM_DSA.py:59), on this box's CPU;
2. OUR jax train step on the SAME CPU backend at the same shape and
   batch size (tpu numbers live in bench.py / BENCHMARKS.md).

The torch-CPU number is a floor for the reference on real accelerators,
so "our TPU videos/s ÷ torch-CPU videos/s" is an upper bound on the
true speedup; the same-box jax-CPU ÷ torch-CPU ratio is the
hardware-neutral framework comparison.  Both are printed as one JSON
line and recorded in BENCHMARKS.md next to the nominal denominator.

Usage:  python tools/bench_reference_torch.py [--iters 5] [--skip-jax]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, 'tests'))

REF = '/root/reference'


def flagship_opt():
    """The bench.py flagship shape (yc2_newModel_sound-class PDVC) at the
    reference's own batch size of 1."""
    from dvc_tpu.utils.config import load_config
    return load_config(
        id='refbench', seed=7, vocab_size=1607, feature_dim=768,
        visual_feature_type='tsp_mvit', frame_embedding_num=200,
        gt_proposal_sample_num=8, max_caption_len=20, hidden_dim=512,
        nheads=8, enc_layers=3, dec_layers=3, transformer_ff_dim=512,
        num_queries=100, input_encoding_size=512, rnn_size=512,
        att_hid_size=512, cap_nheads=8, with_box_refine=True,
        caption_decoder_type='standard', caption_loss_coef=2.0,
        count_loss_coef=0.5, max_eseq_length=20, batch_size=1,
        caption_cost_type='loss', msda_impl='ref', msda_boundary='border',
        device='cpu', invalid_video_json=[])


def synthetic_batch(opt, seed=3):
    """Flagship-shape batch in both layouts: the static flax dict and the
    reference's ragged ``dt`` (one video, reference batch semantics)."""
    import collections

    import numpy as np
    import torch

    rng = np.random.default_rng(seed)
    B, T, C = 1, opt.frame_embedding_num, opt.feature_dim
    G, Lc = opt.gt_proposal_sample_num, opt.max_caption_len
    duration, n_events = 180.0, 6
    video = rng.standard_normal((B, T, C)).astype(np.float32)

    boxes = np.zeros((B, G, 2), np.float32)
    gmask = np.zeros((B, G), bool)
    caps = np.zeros((B, G, Lc), np.int64)
    cmask = np.zeros((B, G, Lc), bool)
    for j in range(n_events):
        s = rng.uniform(0, 0.7) * duration
        e = min(s + rng.uniform(0.1, 0.25) * duration, duration)
        boxes[0, j] = [(s + e) / (2 * duration), (e - s) / duration]
        gmask[0, j] = True
        n_words = int(rng.integers(min(8, Lc - 3), Lc - 2))
        caps[0, j, 1:1 + n_words] = rng.integers(
            1, opt.vocab_size, n_words)
        cmask[0, j, :n_words + 2] = True

    targets = [{
        'boxes': torch.tensor(boxes[0, :n_events]).float(),
        'labels': torch.zeros(n_events, dtype=torch.long),
        'masks': None, 'image_id': 'v0'}]
    batch = {
        'video_tensor': video,
        'video_mask': np.ones((B, T), bool),
        'video_length': np.array([[T, duration, n_events]], np.float32),
        'gt_boxes': boxes, 'gt_boxes_mask': gmask,
        'gt_labels': np.zeros((B, G), np.int32),
        'cap_tensor': caps.astype(np.int32), 'cap_mask': cmask,
    }
    dt = collections.defaultdict(lambda: None)
    dt.update({
        'video_tensor': torch.from_numpy(video),
        'video_mask': torch.ones(B, T, dtype=torch.bool),
        'video_length': torch.from_numpy(batch['video_length']),
        'video_target': targets,
        'gt_boxes': torch.from_numpy(boxes),
        'gt_boxes_mask': torch.from_numpy(gmask),
        'cap_tensor': torch.from_numpy(caps[0, :n_events]).long(),
        'cap_mask': torch.from_numpy(cmask[0, :n_events]),
    })
    return batch, dt


def bench_torch(opt, dt, iters):
    """The reference train iteration, verbatim semantics
    (/root/reference/train.py:173-187): zero_grad, model(dt, criterion),
    weighted sum over weight_dict, backward, clip_grad_norm_, Adam."""
    import torch
    from torch import optim

    from ref_torch_stubs import install as install_stubs
    install_stubs()
    if REF not in sys.path:
        sys.path.append(REF)
    from pdvc.pdvc import build as ref_build

    torch.manual_seed(11)
    model, criterion, _ = ref_build(opt)
    model.train()
    weight_dict = criterion.weight_dict
    optimizer = optim.Adam(model.parameters(), lr=5e-5,
                           weight_decay=opt.weight_decay)

    def step():
        optimizer.zero_grad()
        _, loss = model(dt, criterion, opt.transformer_input_type)
        final = sum(loss[k] * weight_dict[k] for k in loss
                    if k in weight_dict)
        final.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), opt.grad_clip)
        optimizer.step()
        return float(final)

    for _ in range(2):
        step()                       # warm caches / allocator
    t0 = time.perf_counter()
    for _ in range(iters):
        v = step()
    dt_s = (time.perf_counter() - t0) / iters
    assert v == v, 'non-finite torch loss'
    return dt_s


def bench_jax(opt, batch, iters):
    """Our train step on the same CPU backend, same shape, B=1."""
    from dvc_tpu.train.trainer import ensure_cpu_backend
    ensure_cpu_backend()
    import jax
    import jax.numpy as jnp

    from dvc_tpu.train import Trainer
    from dvc_tpu.train.trainer import step_prng_key

    trainer = Trainer(opt)
    state = trainer.init_state(batch, seed=0)
    rng = step_prng_key(opt, 0)
    step = jax.jit(trainer._train_step_impl)
    lr, ssp = jnp.float32(5e-5), jnp.float32(0.0)
    params, opt_state = state['params'], state['opt_state']

    for i in range(2):               # compile + warm
        params, opt_state, losses = step(
            params, opt_state, batch, lr, ssp, jax.random.fold_in(rng, i))
        jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, losses = step(
            params, opt_state, batch, lr, ssp,
            jax.random.fold_in(rng, 10 + i))
    jax.block_until_ready(losses)    # CPU backend: a real barrier
    dt_s = (time.perf_counter() - t0) / iters
    v = float(losses['total_loss'])
    assert v == v, 'non-finite jax loss'
    return dt_s, v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--skip-jax', action='store_true')
    a = ap.parse_args()

    import torch
    opt = flagship_opt()
    batch, dt = synthetic_batch(opt)

    torch_s = bench_torch(opt, dt, a.iters)
    rec = {
        'metric': 'reference_torch_cpu_train_step',
        'torch_cpu_step_s': round(torch_s, 4),
        'torch_cpu_videos_per_s': round(1.0 / torch_s, 3),
        'batch_size': 1,
        'torch_threads': torch.get_num_threads(),
        'cpu_count': os.cpu_count(),
        'note': ('reference loop semantics at flagship shape; '
                 'B=1 is the reference\'s own batch size'),
    }
    if not a.skip_jax:
        jax_s, _ = bench_jax(opt, batch, a.iters)
        rec['jax_cpu_step_s'] = round(jax_s, 4)
        rec['jax_cpu_videos_per_s'] = round(1.0 / jax_s, 3)
        rec['jax_over_torch_same_cpu'] = round(torch_s / jax_s, 3)
    print(json.dumps(rec), flush=True)


if __name__ == '__main__':
    main()
