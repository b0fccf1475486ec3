"""Parameter sharding rules over the ('data', 'model') mesh.

The reference never needs tensor parallelism (models are ~40M params,
SURVEY.md §2.9), so data parallelism is the semantic default.  These rules
make the mesh's ``model`` axis real anyway: the transformer FFN weights —
the parameter bulk — shard column-/row-wise over ``model``; XLA's sharding
propagation inserts the reduce over ICI after the second projection (the
standard Megatron split, expressed only through parameter placement — the
scaling-book recipe: annotate shardings, let the compiler place
collectives).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path_str: str) -> P:
    if 'ffn' in path_str or 'mlp_fc1' in path_str or 'mlp_fc2' in path_str:
        if 'linear1' in path_str or 'mlp_fc1' in path_str:
            if path_str.endswith('kernel'):
                return P(None, 'model')      # column split
            if path_str.endswith('bias'):
                return P('model')
        if 'linear2' in path_str or 'mlp_fc2' in path_str:
            if path_str.endswith('kernel'):
                return P('model', None)      # row split
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree: FFN weights over 'model', everything else
    replicated."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = []
    for path, val in flat:
        ps = '/'.join(str(p) for p in path)
        spec = _spec_for(ps)
        # never shard a dim that doesn't divide
        ok = True
        if spec != P():
            for dim, axis in enumerate(spec):
                if axis is not None and (val.ndim <= dim or
                                         val.shape[dim] % mesh.shape[axis]):
                    ok = False
        out.append(NamedSharding(mesh, spec if ok else P()))
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, out)


def place_params(params, mesh: Mesh):
    sh = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, sh)
