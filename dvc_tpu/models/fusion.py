"""Audio-visual fusion model (the reference's ``NewModel``).

Reference: ``NewModel.py:9-148``.  Pre-extracted TSP/MViTv2 clip features
pass through a 32-head self-attention block (pre/post LayerNorm + MLP
residual), then an audio→visual cross-attention where per-segment HuBERT
audio features are the queries and the visual stream the keys/values; the
fused sequence feeds the standard PDVC model.

TPU notes: the attention blocks are part of the jitted forward; HuBERT
feature extraction lives in the data pipeline
(``dvc_tpu/data/audio.py``) with on-disk caching, mirroring the
reference's ``get_mfcc`` cache side effect (NewModel.py:106-136).  The
reference intends to freeze HuBERT but assigns ``requires_grad_ = False``
as an attribute, leaving it trainable (NewModel.py:37, SURVEY.md §7); here
audio features are genuinely frozen inputs — documented deviation from an
accidental behavior.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .pdvc import PDVC, PDVCConfig


class AttentionBlock(nn.Module):
    """MHA + LayerNorm residual + (Linear+LayerNorm) residual
    (reference NewModel.py:41-65).

    ``dtype='bfloat16'`` runs the projections/attention in bf16 (f32
    params, f32 LayerNorms and residual adds) — the matmuls here are
    f32-MXU-bound at flagship shapes, and the inputs are backbone
    features the extraction path already handles in bf16."""
    dim: int = 768
    num_heads: int = 32
    dtype: str = 'float32'

    @nn.compact
    def __call__(self, query, kv):
        dt = jnp.bfloat16 if self.dtype == 'bfloat16' else jnp.float32
        add = kv
        x = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=dt,
            name='mha')(query, inputs_k=kv, inputs_v=kv,
                        deterministic=True)
        x = nn.LayerNorm(name='ln')(x.astype(jnp.float32))
        x = x + add
        add = x
        x = nn.LayerNorm(name='mlp_ln')(
            nn.Dense(self.dim, dtype=dt,
                     name='mlp_fc')(x).astype(jnp.float32))
        return x + add


def make_fusion_model(opt):
    """Build the FusionPDVC for an opt — THE construction recipe shared
    by training (newTrain), serving, and the driver compile checks: the
    32-head default is halved until it divides feature_dim (reference
    NewModel.py:41-51 hard-codes 32 heads over 768-d features)."""
    from .pdvc import PDVCConfig
    heads = int(getattr(opt, 'fusion_heads', 32) or 32)
    while opt.feature_dim % heads:
        heads //= 2
    return FusionPDVC(
        PDVCConfig.from_opt(opt), fusion_dim=opt.feature_dim,
        fusion_heads=heads,
        fusion_dtype=getattr(opt, 'fusion_dtype', 'float32'))


class FusionPDVC(nn.Module):
    """NewModel: visual self-attention -> audio cross-attention -> PDVC."""
    cfg: PDVCConfig
    fusion_dim: int = 768
    fusion_heads: int = 32
    fusion_dtype: str = 'float32'

    def setup(self):
        self.visual_block = AttentionBlock(self.fusion_dim,
                                           self.fusion_heads,
                                           self.fusion_dtype,
                                           name='visual_sa')
        self.sound_block = AttentionBlock(self.fusion_dim,
                                          self.fusion_heads,
                                          self.fusion_dtype,
                                          name='sound_ca')
        self.pdvc = PDVC(self.cfg, name='pdvc')

    def __call__(self, batch, eval_mode=False, ss_prob=0.0,
                 deterministic=None, ss_enabled=None):
        """batch additionally carries 'sound_tensor' (B, T, 768) aligned
        with the visual clips (zeros when audio is unavailable,
        reference NewModel.py:111-114)."""
        clips = batch['video_tensor']
        sound = batch.get('sound_tensor')
        fused = self.visual_block(clips, clips)
        if sound is not None:
            fused = self.sound_block(sound, fused)
        inner = dict(batch)
        inner['video_tensor'] = fused
        inner.pop('sound_tensor', None)
        return self.pdvc(inner, eval_mode=eval_mode, ss_prob=ss_prob,
                         deterministic=deterministic, ss_enabled=ss_enabled)
