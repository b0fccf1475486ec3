"""Device mesh + sharding helpers (pjit data parallelism).

The reference's only distributed path is PyTorch DDP over NCCL for TSP
backbone pretraining (``video_backbone/TSP/common/utils.py:237-259``); PDVC
training itself is single-GPU.  The TPU-native replacement covers both: one
``jax.sharding.Mesh`` with a ``data`` axis (room for a ``model`` axis for
headroom), batch leaves sharded over ``data``, parameters replicated.
Under ``jax.jit`` XLA inserts the psum gradient reduction over ICI — the
NCCL-allreduce equivalent — automatically.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ('data', 'model'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leaves sharded over the data axis (first/batch dimension)."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def shard_batch_axis1(batch: dict, mesh: Mesh) -> dict:
    """For (K, B, ...) multi-step stacks: shard the batch axis (axis 1)."""
    sh = NamedSharding(mesh, P(None, 'data'))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def replicate_tree(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree)
