"""Multi-host readiness: per-host dataset sharding + cross-host metric sync.

The reference's distributed story is single-host DDP with a
``DistributedSampler`` + ``SmoothedValue.synchronize_between_processes``
allreduce (``video_backbone/TSP/common/utils.py:30-41,237-259``,
``train/train.py:225-243``).  The TPU-native equivalents (SURVEY.md §2.9):

* **input**: each host feeds only its own slice of the dataset.
  ``host_shard_order`` reproduces DistributedSampler semantics — one
  epoch-seeded global permutation shared by all hosts (same seed ⇒ same
  permutation), strided split ``order[rank::world]``, wrap-around padding
  so every host yields the same number of batches (collectives stay in
  lockstep).
* **metrics**: host-local scalar sums are averaged across processes with
  a tiny psum under ``shard_map`` (``sync_metrics``) — the allreduce that
  ``synchronize_between_processes`` does over gloo/NCCL.

Single-process behavior is the identity, so every call site can be
unconditional.  On a real multi-host slice, call
``jax.distributed.initialize()`` first (standard JAX bootstrap); nothing
else in the framework changes — ``jax.devices()`` is already global and
the data mesh spans hosts.
"""

from __future__ import annotations

import numpy as np


def process_info():
    import jax
    return jax.process_index(), jax.process_count()


def host_shard_order(n: int, epoch: int, shuffle: bool, seed: int = 0,
                     process_index: int | None = None,
                     process_count: int | None = None) -> np.ndarray:
    """Per-host sample order for one epoch (DistributedSampler semantics).

    All hosts compute the same global permutation (seed + epoch, like
    ``sampler.set_epoch``), then host i takes ``order[i::world]`` padded by
    wrap-around to ceil(n / world) samples so all hosts run equally many
    steps.
    """
    if process_index is None or process_count is None:
        process_index, process_count = process_info()
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + 1000003 * epoch).shuffle(order)
    if process_count == 1:
        return order
    per_host = -(-n // process_count)                    # ceil
    padded = np.concatenate([order, order[:per_host * process_count - n]])
    return padded[process_index::process_count]


def sync_metrics(metrics: dict, process_count: int | None = None) -> dict:
    """Average host-local scalar metrics across all processes.

    The cross-host allreduce equivalent of the reference's
    ``SmoothedValue.synchronize_between_processes``; identity when
    single-process.
    """
    import jax
    if process_count is None:
        process_count = jax.process_count()
    if process_count == 1:
        return dict(metrics)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    keys = sorted(metrics)
    local = np.asarray([float(metrics[k]) for k in keys], np.float32)
    summed = multihost_utils.process_allgather(jnp.asarray(local))
    mean = np.asarray(summed).reshape(process_count, -1).mean(axis=0)
    return {k: float(v) for k, v in zip(keys, mean)}
