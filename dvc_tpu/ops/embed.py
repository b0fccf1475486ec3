"""Embedding lookup with an MXU-formulated backward.

Autodiff of ``table[ids]`` produces a scatter-add on TPU; for the caption
heads the lookup covers every (pair, word-step) position, so the scatter is
on the training hot path.  The VJP here contracts a one-hot matrix with the
cotangent instead — one MXU matmul (same trick as the deformable-attention
backward, see ``ms_deform_attn.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def embed_lookup(table, ids):
    """table: (V, E); ids: int array (...,). Returns (..., E)."""
    return table[ids]


def _embed_fwd(table, ids):
    return table[ids], (ids, table.shape[0])


def _embed_bwd(res, g):
    ids, V = res
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    onehot = jax.nn.one_hot(flat_ids, V, dtype=flat_g.dtype)   # (N, V)
    d_table = jnp.einsum('nv,ne->ve', onehot, flat_g,
                         preferred_element_type=jnp.float32).astype(g.dtype)
    return d_table, None


embed_lookup.defvjp(_embed_fwd, _embed_bwd)
