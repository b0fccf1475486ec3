"""Multi-level 1-D conv pyramid over frame features.

Reference: ``pdvc/base_encoder.py:23-86``.  Level 0 is a pointwise conv of
the raw features; levels 1..L-1 are stride-2 k=3 convs (level 1 consumes the
raw features again, later levels consume the previous level), each followed
by GroupNorm(32).  Per-level padding masks come from nearest-neighbor
downsampling of the input mask; each level gets its own sine+duration
positional embedding.

All temporal lengths are static: T_l = floor((T_{l-1} - 1) / 2) + 1.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .position_encoding import PositionEmbeddingSine


def pyramid_shapes(T: int, num_levels: int) -> tuple[int, ...]:
    """Static per-level temporal lengths of the conv pyramid."""
    shapes = [T]
    for _ in range(num_levels - 1):
        shapes.append((shapes[-1] - 1) // 2 + 1)
    return tuple(shapes)


def downsample_mask(pad_mask: jnp.ndarray, T_out: int) -> jnp.ndarray:
    """Nearest-neighbor mask downsample (reference base_encoder.py:77,
    F.interpolate nearest: out[i] = in[floor(i * T_in / T_out)])."""
    T_in = pad_mask.shape[1]
    idx = (jnp.arange(T_out) * T_in) // T_out
    return pad_mask[:, idx]


class BaseEncoder(nn.Module):
    num_feature_levels: int
    vf_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, vf, pad_mask, duration):
        """vf: (B, T, C); pad_mask: (B, T) True = padding; duration: (B,).

        Returns (srcs, pad_masks, pos_embeds), each a per-level list with
        srcs[l]: (B, T_l, hidden_dim).
        """
        pos_embed = PositionEmbeddingSine(self.hidden_dim // 2, name='pos_embed')
        L = self.num_feature_levels

        def gn(x, name):
            return nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)(x)

        srcs, masks, poses = [], [], []
        src0 = nn.Conv(self.hidden_dim, (1,), name='input_proj_0',
                       kernel_init=nn.initializers.xavier_uniform(),
                       bias_init=nn.initializers.zeros)(vf)
        srcs.append(gn(src0, 'input_proj_0_norm'))
        masks.append(pad_mask)
        poses.append(pos_embed(pad_mask, duration))

        prev = vf
        for l in range(1, L):
            src = nn.Conv(self.hidden_dim, (3,), strides=(2,),
                          padding=[(1, 1)], name=f'input_proj_{l}',
                          kernel_init=nn.initializers.xavier_uniform(),
                          bias_init=nn.initializers.zeros)(prev)
            src = gn(src, f'input_proj_{l}_norm')
            m = downsample_mask(pad_mask, src.shape[1])
            srcs.append(src)
            masks.append(m)
            poses.append(pos_embed(m, duration))
            prev = src
        return srcs, masks, poses
