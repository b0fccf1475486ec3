"""Video backbones for TSP feature extraction — flax, TPU-native.

Reference: ``video_backbone/TSP/models/backbone.py:15-81`` builds
torchvision VideoResNets (r3d_18, r2plus1d_18, r2plus1d_34 with IG65M
weights and Caffe2 BatchNorm eps=1e-3) and torchvision ``mvit_v2_s``.
Here the same architectures are implemented natively:

* ``VideoResNet`` — 3-D ResNets with either full 3-D convs (R3D) or
  factorized (2+1)-D convs (spatial 1x3x3 then temporal 3x1x1 with the
  torchvision midplane formula).
* ``MViTV2`` — Multiscale Vision Transformer v2 (Li et al., CVPR 2022),
  standard S configuration: 16 blocks in stages [1, 2, 11, 2], widths
  [96, 192, 384, 768], heads [1, 2, 4, 8], pooled q/k/v attention with
  depthwise conv pooling, decomposed relative position embeddings and
  residual pooled-query connections.

Inputs are channels-last (B, T, H, W, C) — the TPU-friendly layout; the
torch-weight converter (``converter.py``) transposes from torch's
(B, C, T, H, W) world.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# VideoResNet (R3D / R(2+1)D)
# ---------------------------------------------------------------------------

def _bn(name, train=False, momentum=0.9, eps=1e-3):
    """BatchNorm; ``train=True`` computes batch statistics and updates the
    running stats (mutable 'batch_stats') — under pjit data sharding the
    batch reduction is global across devices, i.e. SyncBatchNorm semantics
    (reference TSP train.py:241-242) with zero extra code.  ``momentum`` is
    the torch convention (weight of the new batch stat); flax's is the
    complement.  eps=1e-3 is Caffe2 parity for the IG65M weights
    (reference backbone.py:25-28)."""
    return nn.BatchNorm(use_running_average=not train,
                        momentum=1.0 - momentum, epsilon=eps, name=name)


class Conv3DSimple(nn.Module):
    """Full 3-D conv (R3D blocks)."""
    out_planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Conv(self.out_planes, (3, 3, 3),
                       strides=(self.stride,) * 3, padding=[(1, 1)] * 3,
                       use_bias=False, name='conv')(x)


class Conv2Plus1D(nn.Module):
    """Factorized (2+1)-D conv (reference backbone.py:54-81):
    1x3x3 spatial -> BN -> ReLU -> 3x1x1 temporal, with the torchvision
    midplane count keeping parameters comparable to full 3-D."""
    in_planes: int
    out_planes: int
    stride: int = 1
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=False):
        mid = (self.in_planes * self.out_planes * 3 * 3 * 3) // (
            self.in_planes * 3 * 3 + 3 * self.out_planes)
        x = nn.Conv(mid, (1, 3, 3), strides=(1, self.stride, self.stride),
                    padding=[(0, 0), (1, 1), (1, 1)], use_bias=False,
                    name='conv_s')(x)
        x = _bn('bn_mid', train, self.bn_momentum, self.bn_eps)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_planes, (3, 1, 1),
                    strides=(self.stride, 1, 1),
                    padding=[(1, 1), (0, 0), (0, 0)], use_bias=False,
                    name='conv_t')(x)
        return x


class BasicBlock(nn.Module):
    planes: int
    in_planes: int
    conv_type: str  # 'r3d' | 'r2plus1d'
    stride: int = 1
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=False):
        def make(name, in_p, stride):
            if self.conv_type == 'r3d':
                return Conv3DSimple(self.planes, stride, name=name)
            return Conv2Plus1D(in_p, self.planes, stride,
                               self.bn_momentum, self.bn_eps, name=name)

        def bn(name):
            return _bn(name, train, self.bn_momentum, self.bn_eps)

        identity = x
        out = make('conv1', self.in_planes, self.stride)(x, train)
        out = bn('bn1')(out)
        out = nn.relu(out)
        out = make('conv2', self.planes, 1)(out, train)
        out = bn('bn2')(out)
        if self.stride != 1 or self.in_planes != self.planes:
            identity = nn.Conv(self.planes, (1, 1, 1),
                               strides=(self.stride,) * 3, use_bias=False,
                               name='downsample_conv')(x)
            identity = bn('downsample_bn')(identity)
        return nn.relu(out + identity)


class VideoResNet(nn.Module):
    """R3D-18 / R(2+1)D-18 / R(2+1)D-34 feature extractor.

    Returns pooled clip features (B, feature_size=512); matches the TSP
    usage where the classifier fc is stripped (reference model.py:70-73).
    BN eps/momentum: torchvision defaults for the 18-layer variants; the
    IG65M R(2+1)D-34 uses Caffe2 values (reference backbone.py:25-28).
    """
    conv_type: str = 'r2plus1d'
    layers: Sequence[int] = (3, 4, 6, 3)     # 34-layer; 18 uses (2,2,2,2)
    bn_momentum: float = 0.1                 # torch convention
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=False):
        def bn(name):
            return _bn(name, train, self.bn_momentum, self.bn_eps)

        # stem
        if self.conv_type == 'r2plus1d':
            x = nn.Conv(45, (1, 7, 7), strides=(1, 2, 2),
                        padding=[(0, 0), (3, 3), (3, 3)], use_bias=False,
                        name='stem_conv_s')(x)
            x = bn('stem_bn_s')(x)
            x = nn.relu(x)
            x = nn.Conv(64, (3, 1, 1), strides=(1, 1, 1),
                        padding=[(1, 1), (0, 0), (0, 0)], use_bias=False,
                        name='stem_conv_t')(x)
        else:
            x = nn.Conv(64, (3, 7, 7), strides=(1, 2, 2),
                        padding=[(1, 1), (3, 3), (3, 3)], use_bias=False,
                        name='stem_conv')(x)
        x = bn('stem_bn')(x)
        x = nn.relu(x)

        in_planes = 64
        for stage, (blocks, planes, stride) in enumerate(
                zip(self.layers, (64, 128, 256, 512), (1, 2, 2, 2))):
            for b in range(blocks):
                x = BasicBlock(planes, in_planes, self.conv_type,
                               stride if b == 0 else 1,
                               self.bn_momentum, self.bn_eps,
                               name=f'layer{stage + 1}_{b}')(x, train)
                in_planes = planes
        # global average pool over (T, H, W)
        return x.mean(axis=(1, 2, 3))


def r3d_18():
    return VideoResNet(conv_type='r3d', layers=(2, 2, 2, 2))


def r2plus1d_18():
    return VideoResNet(conv_type='r2plus1d', layers=(2, 2, 2, 2))


def r2plus1d_34():
    # Caffe2 BN parity for the IG65M weights (reference backbone.py:25-28)
    return VideoResNet(conv_type='r2plus1d', layers=(3, 4, 6, 3),
                       bn_momentum=0.9, bn_eps=1e-3)


# ---------------------------------------------------------------------------
# MViTv2
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MViTConfig:
    embed_dim: int = 96
    depths: Sequence[int] = (1, 2, 11, 2)
    heads: Sequence[int] = (1, 2, 4, 8)
    temporal_size: int = 16
    spatial_size: int = 224
    mlp_ratio: float = 4.0
    kv_stride0: int = 8      # spatial kv pooling of stage 0 (adaptive decay)
    feature_dim: int = 768


@dataclasses.dataclass(frozen=True)
class MViTBlockSpec:
    """Per-block wiring, mirroring torchvision's mvit_v2_s block table."""
    in_ch: int
    out_ch: int
    heads: int
    q_stride: tuple
    kv_stride: tuple


def mvit_block_specs(cfg: MViTConfig):
    """Block table for MViTv2 (torchvision ``mvit_v2_s`` semantics).

    Channels AND heads double in the same block that pools Q — the first
    block of each stage after the first (the official MViTv2 config's
    DIM_MUL/HEAD_MUL at blocks 1, 3, 14 with DIM_MUL_IN_ATT=True).  The kv
    pooling stride is adaptive: it starts at ``kv_stride0`` and halves at
    every Q-pooling block (including that block itself), floored at 1.
    """
    specs = []
    dim = cfg.embed_dim
    kv = cfg.kv_stride0
    for stage, (depth, heads) in enumerate(zip(cfg.depths, cfg.heads)):
        for b in range(depth):
            pool = (b == 0 and stage > 0)
            if pool:
                kv = max(kv // 2, 1)
            out_ch = dim * 2 if pool else dim
            specs.append(MViTBlockSpec(
                dim, out_ch, heads,
                (1, 2, 2) if pool else (1, 1, 1),
                (1, max(kv, 1), max(kv, 1))))
            dim = out_ch
    return specs


class PoolCls(nn.Module):
    """Attention-tensor pooling with class-token bypass (torchvision
    ``Pool``): depthwise 3x3x3 conv (stride = pooling stride) over the THW
    grid, the class token re-attached, then LayerNorm over the result.

    Implemented as a native XLA grouped conv (NDHWC, feature_group_count=D).
    Measured honestly (in-graph fori chain + result-value fetch — the only
    timing protocol that survives this box's async dispatch), it beats the
    unrolled 27-strided-slice formulation ~40x at the stage-transition
    shapes (0.8 ms vs 32 ms at (16, 8, 56, 56, 96) stride (1,2,2)); the
    round-1 claim of the opposite came from a broken timer.
    """
    dim_per_head: int
    stride: Sequence[int]

    @nn.compact
    def __call__(self, x, thw):
        # x: (B, heads, 1+L, dim_per_head); token 0 is CLS and bypasses
        # the conv pooling (torchvision mvit.py Pool.forward)
        B, H, _, D = x.shape
        t, h, w = thw
        st, sh, sw = self.stride
        cls_tok, grid = x[:, :, :1], x[:, :, 1:]
        kernel = self.param('kernel',
                            nn.initializers.lecun_normal(
                                in_axis=(0, 1, 2), out_axis=3),
                            (3, 3, 3, D))
        x5 = grid.reshape(B * H, t, h, w, D)
        nt = (t - 1) // st + 1
        nh = (h - 1) // sh + 1
        nw = (w - 1) // sw + 1
        out = jax.lax.conv_general_dilated(
            x5, kernel.reshape(3, 3, 3, 1, D).astype(x5.dtype),
            window_strides=(st, sh, sw),
            padding=[(1, 1), (1, 1), (1, 1)],
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
            feature_group_count=D)
        out = out.reshape(B, H, nt * nh * nw, D)
        out = jnp.concatenate([cls_tok, out], axis=2)
        # norm AFTER pooling, over the full sequence incl. CLS
        out = nn.LayerNorm(name='norm', epsilon=1e-5)(out)
        return out, (nt, nh, nw)


def _rel_idx(q_n, k_n, table):
    """Relative-distance table lookup with asymmetric-size scaling
    (torchvision ``_add_rel_pos``)."""
    ratio_q = max(k_n / q_n, 1.0)
    ratio_k = max(q_n / k_n, 1.0)
    qi = np.arange(q_n)[:, None] * ratio_q
    ki = np.arange(k_n)[None, :] * ratio_k
    idx = (qi - ki) + (k_n - 1) * ratio_k
    return table[jnp.asarray(idx.astype(np.int64))]            # (q_n,k_n,D)


def _attention_rel_pos(q, k, v, q_shape, k_shape, rel_h, rel_w, rel_t):
    """softmax(q·kᵀ/√D + decomposed rel-pos bias)·v without materializing
    the joint (Lq, kt, kh, kw) bias (MViTv2 §3.1; torchvision
    ``_add_rel_pos`` semantics, bias on the non-CLS block only).

    The naive broadcast-sum writes a (B, H, Lq, kt, kh, kw) tensor whose
    trailing dims (8, 14, 14 at the transition blocks) straddle lanes —
    measured ~21 ms of a 34 ms block at MViTv2-S block-1 shapes.  Here the
    bias stays factored: scores reshape to (..., kt, kh*kw) (lane-friendly
    minor dim) and get the kt-term and the kh*kw outer-sum term as two
    broadcast adds that XLA fuses into the softmax pass.  The CLS key
    column (no bias) joins through an exact two-chunk log-sum-exp instead
    of an ``.at[].add`` copy of the score matrix.  ~24 ms -> ~4 ms.
    """
    B, nH, N1q, D = q.shape
    qt, qh, qw = q_shape
    kt, kh, kw = k_shape
    Lq = qt * qh * qw
    Lk = kt * kh * kw
    scale = 1.0 / np.sqrt(D)
    f32 = jnp.float32
    # Score/bias dtype: f32 keeps exact torchvision parity; under bf16
    # inputs the score tensors stay bf16 (MXU accumulation is f32 either
    # way — preferred_element_type only sets the OUTPUT dtype).  The
    # early-block score tensor is the extraction forward's biggest byte
    # stream (f32[8,2,6273,1568] = 630 MB with ~5 elementwise passes per
    # block — HLO audit); bf16 halves every pass.  Softmax stability is
    # preserved: the running max is exact in bf16 and the denominator sum
    # accumulates in f32 below.
    acc = jnp.bfloat16 if q.dtype == jnp.bfloat16 else f32

    q5 = q[:, :, 1:].reshape(B, nH, qt, qh, qw, D)
    Rt = _rel_idx(qt, kt, rel_t)
    Rh = _rel_idx(qh, kh, rel_h)
    Rw = _rel_idx(qw, kw, rel_w)
    bias_t = jnp.einsum('bnthwd,tkd->bnthwk', q5, Rt,
                        preferred_element_type=acc).reshape(B, nH, Lq, kt)
    bias_h = jnp.einsum('bnthwd,hkd->bnthwk', q5, Rh,
                        preferred_element_type=acc).reshape(B, nH, Lq, kh)
    bias_w = jnp.einsum('bnthwd,wkd->bnthwk', q5, Rw,
                        preferred_element_type=acc).reshape(B, nH, Lq, kw)
    bias_hw = (bias_h[..., :, None] + bias_w[..., None, :]).reshape(
        B, nH, Lq, kh * kw)
    # zero-bias row for the CLS query
    bias_t = jnp.pad(bias_t, ((0, 0), (0, 0), (1, 0), (0, 0)))
    bias_hw = jnp.pad(bias_hw, ((0, 0), (0, 0), (1, 0), (0, 0)))

    k_cls, k_grid = k[:, :, 0], k[:, :, 1:]
    v_cls, v_grid = v[:, :, :1], v[:, :, 1:]
    s_grid = jnp.einsum('bhqd,bhkd->bhqk', q, k_grid,
                        preferred_element_type=acc) * acc(scale)
    s_grid = (s_grid.reshape(B, nH, N1q, kt, kh * kw)
              + bias_t[..., :, None]
              + bias_hw[..., None, :]).reshape(B, nH, N1q, Lk)
    s_cls = (jnp.einsum('bhqd,bhd->bhq', q, k_cls,
                        preferred_element_type=acc) * acc(scale))[..., None]
    m = jnp.maximum(jnp.max(s_grid, axis=-1, keepdims=True), s_cls)
    e_cls = jnp.exp((s_cls - m).astype(f32))           # (B, H, 1+Lq, 1)
    e_grid = jnp.exp(s_grid - m)
    denom = e_cls + jnp.sum(e_grid, axis=-1, keepdims=True, dtype=f32)
    out = (e_cls * v_cls.astype(f32)
           + jnp.einsum('bhqk,bhkd->bhqd', e_grid, v_grid,
                        preferred_element_type=f32)) / denom
    return out.astype(q.dtype)


class _SplitDense(nn.Module):
    """One packed (in, n*E) Dense whose n outputs are produced by WEIGHT
    slicing — three separate (in, E) matmuls instead of one (in, 3E)
    matmul followed by an output split.  Param tree ('kernel'/'bias' under
    the module name) is identical to ``nn.Dense(n*E)``, so checkpoints and
    the torch converter are unchanged; what changes is that XLA never
    materializes the packed (B, N, 3E) tensor whose split/relayout cost
    ~1.5 ms per early MViT block at (N=25k) shapes (device profile)."""
    features: int
    n_split: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        E = self.features // self.n_split
        outs = []
        for i in range(self.n_split):
            k_i = jax.lax.slice_in_dim(kernel, i * E, (i + 1) * E, axis=1)
            b_i = jax.lax.slice_in_dim(bias, i * E, (i + 1) * E, axis=0)
            outs.append(jnp.dot(x, k_i.astype(x.dtype)) + b_i.astype(x.dtype))
        return outs


class MultiscaleAttention(nn.Module):
    spec: MViTBlockSpec

    @nn.compact
    def __call__(self, x, thw):
        # x: (B, 1+L, in_ch) — already norm1-ed by the block
        B, N, _ = x.shape
        H = self.spec.heads
        D = self.spec.out_ch // H
        q, k, v = _SplitDense(3 * self.spec.out_ch, 3, name='qkv')(x)

        def heads(t):   # (B, N, E) -> (B, H, N, D)
            return t.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        q, k, v = heads(q), heads(k), heads(v)          # (B, H, 1+L, D)

        q, q_shape = PoolCls(D, self.spec.q_stride, name='pool_q')(q, thw)
        k, k_shape = PoolCls(D, self.spec.kv_stride, name='pool_k')(k, thw)
        v, _ = PoolCls(D, self.spec.kv_stride, name='pool_v')(v, thw)

        # decomposed relative position embeddings (non-CLS block of attn)
        max_t = max(q_shape[0], k_shape[0])
        max_h = max(q_shape[1], k_shape[1])
        max_w = max(q_shape[2], k_shape[2])
        rel_t = self.param('rel_pos_t', nn.initializers.zeros,
                           (2 * max_t - 1, D))
        rel_h = self.param('rel_pos_h', nn.initializers.zeros,
                           (2 * max_h - 1, D))
        rel_w = self.param('rel_pos_w', nn.initializers.zeros,
                           (2 * max_w - 1, D))
        out = _attention_rel_pos(q, k, v, q_shape, k_shape,
                                 rel_h, rel_w, rel_t)
        # residual pooling (v2), CLS excluded (residual_with_cls_embed=
        # False).  concat instead of .at[1:].add: the dynamic-update-slice
        # the latter lowers to is a full read-modify-write of the (B, H,
        # 1+Lq, D) tensor (~1.4 ms/fwd across blocks, device profile); the
        # add below fuses into the attention epilogue and the concat is a
        # single ordinary copy.
        out = jnp.concatenate([out[:, :, :1], out[:, :, 1:] + q[:, :, 1:]],
                              axis=2)
        Lq = out.shape[2]
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.spec.out_ch)
        out = nn.Dense(self.spec.out_ch, name='proj')(out)
        return out, q_shape


def _skip_max_pool(x, thw, stride):
    """Residual-path max pool with CLS bypass: kernel = stride+1 (where
    stride>1), padding kernel//2 — torchvision MultiscaleBlock.pool_skip."""
    B, _, C = x.shape
    t, h, w = thw
    cls_tok, grid = x[:, :1], x[:, 1:]
    window = tuple(s + 1 if s > 1 else s for s in stride)
    padding = tuple((k // 2, k // 2) for k in window)
    g = grid.reshape(B, t, h, w, C)
    g = nn.max_pool(g, window_shape=window, strides=tuple(stride),
                    padding=padding)
    g = g.reshape(B, -1, C)
    return jnp.concatenate([cls_tok, g], axis=1)


class MultiscaleBlock(nn.Module):
    spec: MViTBlockSpec
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, thw):
        spec = self.spec
        shortcut = x
        h = nn.LayerNorm(name='norm1', epsilon=1e-5)(x)
        attn_out, new_thw = MultiscaleAttention(spec, name='attn')(h, thw)
        if spec.in_ch != spec.out_ch:
            # expand channels on the normed input (proj_after_attn=True)
            shortcut = nn.Dense(spec.out_ch, name='shortcut_proj')(h)
        if tuple(spec.q_stride) != (1, 1, 1):
            shortcut = _skip_max_pool(shortcut, thw, spec.q_stride)
        x = shortcut + attn_out
        h2 = nn.LayerNorm(name='norm2', epsilon=1e-5)(x)
        h2 = nn.Dense(int(spec.out_ch * self.mlp_ratio), name='mlp_fc1')(h2)
        # exact-erf GELU (torchvision nn.GELU default) in f32 for
        # checkpoint parity; under bf16 inputs the tanh approximation is
        # used instead — its |Δ| < 5e-4 is below bf16 resolution while
        # XLA's exact-erf lowering costs several full u32 bit-twiddling
        # passes over the (N, 4*ch) MLP tensor (extraction HLO audit)
        h2 = nn.gelu(h2, approximate=(h2.dtype == jnp.bfloat16))
        h2 = nn.Dense(spec.out_ch, name='mlp_fc2')(h2)
        return x + h2, new_thw


class PatchEmbed(nn.Module):
    """Patchify stem: 3x7x7 conv, stride (2,4,4), padding (1,3,3).

    A direct conv with C_in=3 runs ~50x below roofline on TPU (the 3 input
    channels rattle inside 128-wide lanes).  Equivalent reformulation:
    zero-pad the kernel to a (4,8,8) window — stride-multiples — then
    space-to-depth both operands by (2,4,4) blocks, giving a (2,2,2) conv
    with 96 input channels that the MXU tiles properly (57 ms -> ~2 ms per
    (8,16,224,224,3) batch).  Parameters keep the torchvision conv layout
    (kernel (3,7,7,3,C), bias (C,)) so the torch-weight converter and
    checkpoints are unchanged.
    """
    embed_dim: int

    @nn.compact
    def __call__(self, x):
        C = self.embed_dim
        kernel = self.param('kernel', nn.initializers.lecun_normal(
            in_axis=(0, 1, 2, 3), out_axis=4), (3, 7, 7, 3, C))
        bias = self.param('bias', nn.initializers.zeros, (C,))
        B, T, H, W, _ = x.shape
        # kernel (3,7,7) -> (4,8,8) window (zero taps), blocked (2,4,4)
        k = jnp.pad(kernel, ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
        k = k.reshape(2, 2, 2, 4, 2, 4, 3, C)        # (bt,i,bh,j,bw,kk,c,o)
        k = k.transpose(0, 2, 4, 1, 3, 5, 6, 7).reshape(2, 2, 2, 96, C)
        # input: pad (1,1),(3,1),(3,1) so windows align to (2,4,4) blocks
        xp = jnp.pad(x, ((0, 0), (1, 1), (3, 1), (3, 1), (0, 0)))
        bt, bh, bw = (T + 2) // 2, (H + 4) // 4, (W + 4) // 4
        xs = xp.reshape(B, bt, 2, bh, 4, bw, 4, 3)
        # NOTE: the split-reshape + transpose costs two materialized
        # passes over the ~90 MB block tensor (device profile: 2.3 + 1.0
        # ms per batch); expressing the pair as one
        # lax.reshape(dimensions=...) measured a statistical tie (38.4 vs
        # 38.6 ms/fwd) — XLA canonicalizes both forms identically, so the
        # idiomatic form stays
        xs = xs.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(B, bt, bh, bw, 96)
        out = jax.lax.conv_general_dilated(
            xs, k.astype(xs.dtype), window_strides=(1, 1, 1),
            padding='VALID', dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        return out + bias.astype(out.dtype)


class MViTV2(nn.Module):
    """MViTv2 feature extractor; returns the CLS-token features (B, 768) —
    what the reference's TSP usage consumes (TSPmodel.py:82-85 strips the
    classification head, keeping ``x[:, 0]``)."""
    cfg: MViTConfig = MViTConfig()

    @nn.compact
    def __call__(self, x, train=False):
        c = self.cfg
        # patchify stem: 3x7x7 conv stride (2,4,4)
        x = PatchEmbed(c.embed_dim, name='patch_embed')(x)
        B, t, h, w, C = x.shape
        thw = (t, h, w)
        x = x.reshape(B, t * h * w, C)
        cls = self.param('cls_token', nn.initializers.zeros, (C,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, C)), x], axis=1)

        for i, spec in enumerate(mvit_block_specs(c)):
            x, thw = MultiscaleBlock(spec, c.mlp_ratio,
                                     name=f'block_{i}')(x, thw)
        x = nn.LayerNorm(name='norm', epsilon=1e-5)(x)
        return x[:, 0]


def mvit_v2_s():
    return MViTV2(MViTConfig())
