"""Mesh partitioning for the Pallas ops.

XLA's GSPMD partitioner cannot shard a ``pallas_call`` (an opaque custom
call): under ``jit`` with batch-sharded operands it all-gathers the full
batch onto every device and runs the kernel fully replicated.  The
kernels' grids are embarrassingly batch-parallel (grid=(B,) /(B,H)), so
the TPU-native answer is ``shard_map`` over the mesh's data axis: each
device runs the kernel on its own batch shard, and gradients flowing to
replicated operands (the attention parameters) get the cross-device psum
automatically from shard_map's transpose rule.

The trainer advertises its mesh via ``set_op_mesh``; the op dispatchers
(``ops/ms_deform_attn.py``, ``ops/dsa_step.py``) consult it at trace time
and wrap their pallas path when the data axis is actually sharded.  With
no mesh set (single chip, or CPU tests) the ops are called directly.

This replaces what the reference gets from torch DDP replication of its
CUDA extension (every rank holds a full module copy —
``train.py:60-76``): here one jitted program spans the mesh and only the
opaque kernels need the explicit map.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
from jax.sharding import PartitionSpec as P

_OP_MESH = None  # (Mesh, axis_name) | None


def set_op_mesh(mesh, axis: str = 'data'):
    """Advertise the mesh for op-level partitioning (shard_map of the
    pallas kernels over ``axis``; activation sharding constraints).  Pass
    mesh=None to clear.  A single-device mesh is treated as unset (every
    wrap would be a no-op)."""
    global _OP_MESH
    if mesh is None or mesh.size <= 1:
        _OP_MESH = None
    else:
        _OP_MESH = (mesh, axis)


def get_op_mesh():
    return _OP_MESH


@contextmanager
def op_mesh(mesh, axis: str = 'data'):
    """Scoped ``set_op_mesh`` (tests; multi-trainer processes)."""
    prev = _OP_MESH
    try:
        set_op_mesh(mesh, axis)
        yield
    finally:
        globals()['_OP_MESH'] = prev


def partition_batched(fn, batched, replicated=()):
    """Call ``fn(*batched, *replicated)``, shard_mapped over the op mesh.

    ``batched`` args are split on axis 0 across the data axis; ``replicated``
    args (parameters) are unmapped — their cotangents are psummed across the
    mesh by shard_map's transpose.  Falls back to a direct call when no op
    mesh is set or the batch does not divide the axis (GSPMD then runs the
    op replicated — correct, just not parallel).
    """
    ctx = get_op_mesh()
    if ctx is None:
        return fn(*batched, *replicated)
    mesh, axis = ctx
    n = dict(mesh.shape).get(axis, 1)
    if n <= 1 or batched[0].shape[0] % n != 0:
        return fn(*batched, *replicated)
    in_specs = tuple([P(axis)] * len(batched) + [P()] * len(replicated))
    # check_vma=False: pallas_call out_shapes don't declare varying mesh
    # axes; the transpose still psums cotangents of the unmapped inputs
    # (pinned by tests/test_op_partition.py's parameter-gradient parity)
    mapped = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                           out_specs=P(axis), check_vma=False)
    return mapped(*batched, *replicated)


def constrain(x, spec: P):
    """``with_sharding_constraint`` against the op mesh, or identity when
    none is set / the spec's axes all have size 1.  Lets model code state
    activation layouts (e.g. sequence parallelism over the 'model' axis)
    without threading a Mesh through the module tree.

    Dims whose size does not divide their axis product are left
    unconstrained (with a trace-time warning): with_sharding_constraint
    has no implicit padding, and an uneven frame pyramid is a config
    choice (pick frame_embedding_num so sum(T/2^l) divides the axis)."""
    ctx = get_op_mesh()
    if ctx is None:
        return x
    mesh, _ = ctx
    shape = dict(mesh.shape)

    names = [a for axes in spec if axes is not None
             for a in ((axes,) if isinstance(axes, str) else axes)]
    if any(a not in shape for a in names):
        import warnings
        warnings.warn(f'constrain: mesh {tuple(shape)} lacks axes of '
                      f'{spec} — leaving unsharded', stacklevel=2)
        return x

    def axis_prod(axes):
        if axes is None:
            return 1
        axes = (axes,) if isinstance(axes, str) else axes
        n = 1
        for a in axes:
            n *= shape[a]
        return n

    sizes = [axis_prod(a) for a in spec]
    if all(n <= 1 for n in sizes):
        return x
    for dim, n in zip(x.shape, sizes):
        if n > 1 and dim % n != 0:
            import warnings
            warnings.warn(
                f'constrain: dim of size {dim} not divisible by mesh axes '
                f'{spec} — leaving unsharded', stacklevel=2)
            return x
    from jax.sharding import NamedSharding
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
