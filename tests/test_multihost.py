"""Multi-host input sharding + metric sync (SURVEY.md §2.9: the
DistributedSampler / synchronize_between_processes equivalents).

A real N-process run needs ``jax.distributed.initialize`` on N hosts; here
the semantics are exercised by instantiating the per-host views directly
(process_index i of process_count W), which is exactly what each host
computes — the shared epoch seed guarantees all hosts agree on the global
permutation without communicating.
"""
import numpy as np

from dvc_tpu.parallel.multihost import host_shard_order, sync_metrics


def test_host_shards_partition_and_balance():
    n, W = 103, 4
    shards = [host_shard_order(n, epoch=2, shuffle=True, seed=5,
                               process_index=i, process_count=W)
              for i in range(W)]
    # equal length on every host (wrap-around padding keeps lockstep)
    assert len({len(s) for s in shards}) == 1
    assert len(shards[0]) == -(-n // W)
    # union covers the dataset; overlap only from the wrap padding
    all_idx = np.concatenate(shards)
    assert set(all_idx.tolist()) == set(range(n))
    assert len(all_idx) - n == W * -(-n // W) - n


def test_host_shards_deterministic_and_epoch_varying():
    a = host_shard_order(50, 1, True, 0, 0, 2)
    b = host_shard_order(50, 1, True, 0, 0, 2)
    c = host_shard_order(50, 2, True, 0, 0, 2)
    assert (a == b).all()          # same epoch: identical on every call
    assert not (a == c).all()      # new epoch: reshuffled
    # no shuffle: strided identity split
    d = host_shard_order(10, 0, False, 0, 1, 2)
    assert d.tolist() == [1, 3, 5, 7, 9]


def test_host_shards_agree_across_hosts():
    """Hosts derive disjoint slices of ONE permutation from the shared
    seed — the no-communication contract DistributedSampler relies on."""
    n, W, epoch = 64, 8, 3
    perm0 = host_shard_order(n, epoch, True, 7, None, None)  # 1-proc: full
    shards = [host_shard_order(n, epoch, True, 7, i, W) for i in range(W)]
    interleaved = np.empty(n, np.int64)
    for i, s in enumerate(shards):
        interleaved[i::W] = s
    assert (interleaved == perm0).all()


def test_sync_metrics_single_process_identity():
    m = {'loss': 1.5, 'acc': 0.25}
    assert sync_metrics(m) == m


def test_batchloader_host_sharding():
    """BatchLoader with process args yields each host a disjoint,
    equally-sized stream; set_epoch reseeds the shared shuffle."""
    import json
    import os
    import tempfile

    from dvc_tpu.data import BatchLoader, DenseCaptionDataset
    from dvc_tpu.utils.config import load_config
    from synth import make_synth_dataset

    with tempfile.TemporaryDirectory() as root:
        anno, feats, vocab, vsize = make_synth_dataset(root, n_videos=9)
        opt = load_config(
            vocab_size=vsize, visual_feature_type='tsp', feature_dim=16,
            frame_embedding_num=24, gt_proposal_sample_num=4,
            max_caption_len=10, invalid_video_json=[], batch_size=2)
        ds = DenseCaptionDataset(anno, feats, vocab, True, opt)
        keys = [[], []]
        for pi in range(2):
            loader = BatchLoader(ds, 2, shuffle=True, opt=opt, seed=3,
                                 drop_last=False,
                                 process_index=pi, process_count=2)
            loader.set_epoch(1)
            for batch, meta in loader:
                keys[pi].extend(meta['keys'][:meta['n_real']])
        assert len(keys[0]) == len(keys[1])
        # disjoint up to the wrap-padding sample (9 -> 5 per host, 1 wraps)
        overlap = set(keys[0]) & set(keys[1])
        assert len(overlap) <= 1
        assert len(set(keys[0]) | set(keys[1])) == 9
