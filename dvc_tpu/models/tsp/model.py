"""TSP model head: backbone + action / temporal-region classifiers.

Reference: ``video_backbone/TSP/models/model.py:6-96`` (duplicated as
``TSPmodel.py``).  One or two FC heads over pooled clip features; the
second head optionally consumes the concatenation with a global video
feature (GVF).  ``return_features=True`` yields the pooled features used as
PDVC frame features (768-d for MViTv2, 512-d for VideoResNets).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .backbones import mvit_v2_s, r2plus1d_18, r2plus1d_34, r3d_18

BACKBONES = {
    'r2plus1d_34': (r2plus1d_34, 512),
    'r2plus1d_18': (r2plus1d_18, 512),
    'r3d_18': (r3d_18, 512),
    'mvit_v2_s': (mvit_v2_s, 768),
}

# GVF width for the mvit head (reference model.py:37-38: feature_size+512)
GVF_DIM = 512


class TSPModel(nn.Module):
    backbone: str = 'mvit_v2_s'
    num_classes: Sequence[int] = (1, 1)
    num_heads: int = 2
    concat_gvf: bool = False
    dropout: float = 0.5

    def setup(self):
        assert len(self.num_classes) == self.num_heads
        assert self.num_heads in (1, 2)
        builder, self.feature_size = BACKBONES[self.backbone]
        self.features = builder()
        fc_init = nn.initializers.normal(0.01)
        if self.num_heads == 1:
            self.fc = nn.Dense(self.num_classes[0], kernel_init=fc_init)
        else:
            self.fc1 = nn.Dense(self.num_classes[0], kernel_init=fc_init)
            self.fc2 = nn.Dense(self.num_classes[1], kernel_init=fc_init)

    def __call__(self, x, gvf=None, return_features=False, train=False,
                 deterministic=True):
        """x: (B, T, H, W, 3) normalized clips."""
        feats = self.features(x, train=train)
        if self.backbone == 'mvit_v2_s' and not deterministic:
            feats = nn.Dropout(self.dropout, deterministic=False)(feats)
        if self.num_heads == 1:
            logits = [self.fc(feats)]
        else:
            logits = [self.fc1(feats)]
            if self.concat_gvf:
                assert gvf is not None, 'expected a global video feature'
                logits.append(self.fc2(jnp.concatenate([feats, gvf], -1)))
            else:
                logits.append(self.fc2(feats))
        return (logits, feats) if return_features else logits


def tsp_cross_entropy(logits, labels):
    """CE with ignore_index=-1 (reference TSP/train/train.py:65-76)."""
    import jax
    valid = labels >= 0
    safe = jnp.clip(labels, 0, None)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    return -(picked * valid).sum() / jnp.maximum(valid.sum(), 1)
