"""Deformable transformer encoder/decoder (1-D temporal, TPU-native).

Reference: ``pdvc/deformable_transformer.py``.  The encoder is a stack of
MS-deformable self-attention + FFN layers over the flattened multi-level
sequence; the decoder alternates standard multi-head self-attention over the
event queries, MS-deformable cross-attention into the encoder memory, and an
FFN, with iterative box refinement between layers.

The whole thing is trace-once/compile-once: level lengths are static python
ints, loops over layers are unrolled (2-6 layers), and the deformable
attention core dispatches to the Pallas kernel on TPU.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ms_deform_attn



def msda_offset_bias_init(n_heads: int, n_levels: int, n_points: int,
                          center: bool = False):
    """Per-head directional bias for the sampling-offset projection.

    Reference ``pdvc/ops/modules/ms_deform_attn.py:62-71``: 2-D unit
    directions cos/sin(2πh/H) normalized to the unit square, of which the
    1-D op keeps the x component, scaled by (point index + 1).  The caption
    variant (``ms_deform_attn_for_caption.py:60-70``) additionally centers
    the grid over points (``center=True``).
    """
    thetas = np.arange(n_heads, dtype=np.float32) * (2 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    gx = grid[:, 0][:, None, None]                       # (H, 1, 1)
    gx = np.tile(gx, (1, n_levels, n_points))
    for i in range(n_points):
        gx[:, :, i] *= i + 1
    if center:
        gx = gx - gx.mean(2, keepdims=True)

    def init(key, shape, dtype=jnp.float32):
        assert shape == (n_heads * n_levels * n_points,), shape
        return jnp.asarray(gx.reshape(-1), dtype)
    return init


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention module (reference ms_deform_attn.py:30-126)."""
    d_model: int
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    impl: str = 'auto'
    boundary: str = 'zeros'
    dtype: object = jnp.float32

    def sampling_locations(self, query, reference_points, temporal_shapes):
        B, Lq, _ = query.shape
        H, L, P = self.n_heads, self.n_levels, self.n_points
        query = query.astype(jnp.float32)
        offsets = nn.Dense(
            H * L * P, name='sampling_offsets',
            kernel_init=nn.initializers.zeros,
            bias_init=msda_offset_bias_init(H, L, P, center=self.center_init),
        )(query).reshape(B, Lq, H, L, P)
        attn = nn.Dense(H * L * P, name='attention_weights',
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros)(query)
        attn = jax.nn.softmax(attn.reshape(B, Lq, H, L * P), axis=-1)
        attn = attn.reshape(B, Lq, H, L, P)

        shapes_arr = jnp.asarray(temporal_shapes, jnp.float32)
        if reference_points.shape[-1] == 1:
            # (B, Lq, L, 1) -> (B, Lq, H, L, P)
            loc = (reference_points[:, :, None, :, None, 0]
                   + offsets / shapes_arr[None, None, None, :, None])
        elif reference_points.shape[-1] == 2:
            loc = (reference_points[:, :, None, :, None, 0]
                   + offsets / self.n_points
                   * reference_points[:, :, None, :, None, 1] * 0.5)
        else:
            raise ValueError('reference_points last dim must be 1 or 2')
        return loc, attn

    center_init: bool = False

    @nn.compact
    def __call__(self, query, reference_points, input_flatten,
                 temporal_shapes: Sequence[int], pad_mask=None):
        """query (B, Lq, C); reference_points (B, Lq, L, 1|2) in [0,1];
        input_flatten (B, S, C); pad_mask (B, S) True = padding."""
        B, S, _ = input_flatten.shape
        H = self.n_heads
        D = self.d_model // H
        value = nn.Dense(self.d_model, name='value_proj', dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         bias_init=nn.initializers.zeros)(input_flatten)
        if pad_mask is not None:
            value = jnp.where(pad_mask[..., None], 0.0, value)
        value = value.reshape(B, S, H, D)
        loc, attn = self.sampling_locations(query, reference_points,
                                            temporal_shapes)
        out = ms_deform_attn(value.astype(jnp.float32),
                             tuple(temporal_shapes), loc, attn,
                             mode=self.boundary, impl=self.impl)
        return nn.Dense(self.d_model, name='output_proj', dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        bias_init=nn.initializers.zeros)(out)


class FFN(nn.Module):
    d_model: int
    d_ffn: int
    dropout: float
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool):
        h = nn.Dense(self.d_ffn, name='linear1', dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name='linear2', dtype=self.dtype)(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        # normalization statistics stay f32 for stability
        return nn.LayerNorm(name='norm')(x.astype(jnp.float32)).astype(
            self.dtype)


class EncoderLayer(nn.Module):
    """MS-deform self-attention + FFN (reference deformable_transformer.py:149-189)."""
    d_model: int
    d_ffn: int
    dropout: float
    n_levels: int
    n_heads: int
    n_points: int
    msda_impl: str = 'auto'
    msda_boundary: str = 'zeros'
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, temporal_shapes,
                 pad_mask, deterministic: bool):
        src = src.astype(self.dtype)
        src2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                            self.n_points, impl=self.msda_impl,
                            boundary=self.msda_boundary,
                            dtype=self.dtype, name='self_attn')(
            (src + pos).astype(self.dtype), reference_points, src,
            temporal_shapes, pad_mask)
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        src = nn.LayerNorm(name='norm1')(src.astype(jnp.float32)).astype(
            self.dtype)
        return FFN(self.d_model, self.d_ffn, self.dropout, dtype=self.dtype,
                   name='ffn')(src, deterministic)


class DecoderLayer(nn.Module):
    """Query self-attn + deformable cross-attn + FFN
    (reference deformable_transformer.py:219-271)."""
    d_model: int
    d_ffn: int
    dropout: float
    n_levels: int
    n_heads: int
    n_points: int
    msda_impl: str = 'auto'
    msda_boundary: str = 'zeros'
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src,
                 temporal_shapes, src_pad_mask, query_mask,
                 deterministic: bool):
        tgt = tgt.astype(self.dtype)
        query_pos = query_pos.astype(self.dtype)
        q = k = tgt + query_pos
        attn_mask = None
        if query_mask is not None:
            # key padding mask: (B, 1, 1, Nq), True = attend
            attn_mask = query_mask[:, None, None, :]
        tgt2 = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dropout_rate=self.dropout,
            dtype=self.dtype, name='self_attn')(
            q, k, tgt, mask=attn_mask, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(name='norm2')(tgt.astype(jnp.float32)).astype(
            self.dtype)

        tgt2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                            self.n_points, impl=self.msda_impl,
                            boundary=self.msda_boundary,
                            dtype=self.dtype, name='cross_attn')(
            tgt + query_pos, reference_points, src, temporal_shapes,
            src_pad_mask)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(name='norm1')(tgt.astype(jnp.float32)).astype(
            self.dtype)
        return FFN(self.d_model, self.d_ffn, self.dropout, dtype=self.dtype,
                   name='ffn')(tgt, deterministic)


def encoder_reference_points(temporal_shapes: Sequence[int], valid_ratios):
    """Per-position reference points (reference :198-208).

    valid_ratios: (B, L).  Returns (B, S, L, 1).
    """
    refs = []
    for lvl, T in enumerate(temporal_shapes):
        ref = (jnp.arange(T, dtype=jnp.float32) + 0.5)[None, :]
        ref = ref / (valid_ratios[:, None, lvl] * T)
        refs.append(ref)
    reference_points = jnp.concatenate(refs, axis=1)          # (B, S)
    reference_points = reference_points[:, :, None] * valid_ratios[:, None]
    return reference_points[:, :, :, None]
