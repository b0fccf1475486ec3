"""Sine positional embedding concatenated with a learned duration embedding.

Reference: ``pdvc/position_encoding.py:20-75``.  The first half of the
channel dim is the standard DETR sine embedding over *valid* (unpadded)
positions, normalized to 2π; the second half is a per-video duration code:
a binary vector with the first ``int(duration)`` entries set, pushed through
a Linear and broadcast across time.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


class PositionEmbeddingSine(nn.Module):
    num_pos_feats: int = 256
    temperature: float = 10000.0
    scale: float = 2 * math.pi
    max_duration: int = 256

    @nn.compact
    def __call__(self, pad_mask: jnp.ndarray, duration: jnp.ndarray):
        """pad_mask: (B, T) True = padding; duration: (B,) seconds.

        Returns (B, T, 2 * num_pos_feats).
        """
        not_mask = (~pad_mask).astype(jnp.float32)
        x_embed = jnp.cumsum(not_mask, axis=1)
        eps = 1e-6
        x_embed = (x_embed - 0.5) / (x_embed[:, -1:] + eps) * self.scale

        dim_t = jnp.arange(self.num_pos_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / self.num_pos_feats)
        pos_x = x_embed[:, :, None] / dim_t          # (B, T, F)
        pos_x = jnp.stack(
            (jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])),
            axis=3).reshape(pos_x.shape[0], pos_x.shape[1], -1)

        # duration embedding (reference :58-64): binary length code -> Linear
        dur = jnp.clip(duration.astype(jnp.int32), 0, self.max_duration)
        binary = (jnp.arange(self.max_duration) < dur[:, None]).astype(jnp.float32)
        dur_embed = nn.Dense(self.num_pos_feats, name='duration_embed_layer')(binary)
        dur_embed = jnp.broadcast_to(dur_embed[:, None, :], pos_x.shape)
        return jnp.concatenate([pos_x, dur_embed], axis=2)
