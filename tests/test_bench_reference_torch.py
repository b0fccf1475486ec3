"""Smoke coverage for tools/bench_reference_torch.py (the measured
same-box baseline anchor): the flagship opt builds, the synthetic batch
has reference-compatible shapes in BOTH layouts, and our jax step runs
on it at a reduced width (the full-shape timing run is the tool's job,
not the test lane's)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))

import bench_reference_torch as brt  # noqa: E402


def test_flagship_opt_and_batch_shapes():
    opt = brt.flagship_opt()
    assert opt.batch_size == 1                 # the reference's own B
    assert opt.caption_decoder_type == 'standard'
    batch, dt = brt.synthetic_batch(opt)

    T, C = opt.frame_embedding_num, opt.feature_dim
    G, Lc = opt.gt_proposal_sample_num, opt.max_caption_len
    assert batch['video_tensor'].shape == (1, T, C)
    assert batch['cap_tensor'].shape == (1, G, Lc)
    n_events = int(batch['video_length'][0, 2])
    assert batch['gt_boxes_mask'][0].sum() == n_events

    # ragged torch layout: one row per event, not per proposal slot
    assert dt['cap_tensor'].shape == (n_events, Lc)
    assert len(dt['video_target'][0]['boxes']) == n_events
    # cl-format boxes stay inside the unit interval
    b = batch['gt_boxes'][0, :n_events]
    assert np.all(b[:, 0] - b[:, 1] / 2 >= -1e-6)
    assert np.all(b[:, 0] + b[:, 1] / 2 <= 1 + 1e-6)


def test_jax_step_runs_on_anchor_batch():
    # reduced width so the fast lane stays fast; the batch builder and
    # step plumbing are what this test pins
    opt = brt.flagship_opt()
    for k, v in dict(vocab_size=24, feature_dim=16, frame_embedding_num=24,
                     hidden_dim=64, nheads=4, enc_layers=1, dec_layers=1,
                     transformer_ff_dim=64, num_queries=10,
                     input_encoding_size=32, rnn_size=64, att_hid_size=16,
                     max_caption_len=8).items():
        setattr(opt, k, v)
    batch, _ = brt.synthetic_batch(opt)
    dt_s = brt.bench_jax(opt, batch, iters=1)
    assert dt_s > 0
