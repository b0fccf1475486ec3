"""Torch reference implementation of torchvision's MViT-v2 forward.

torchvision is not installed in this environment (torch CPU is), so this
module re-creates ``torchvision.models.video.mvit`` v2 semantics — state-dict
key names included — to serve as the conversion/parity oracle for
``dvc_tpu.models.tsp.convert_mvit`` + the flax ``MViTV2``:

* class token prepended by ``pos_encoding`` (no absolute position tables —
  ``rel_pos_embed=True``)
* pooled q/k/v attention: depthwise 3x3x3 conv (bias-free) over the THW
  grid with the class token bypassing the pool, LayerNorm after re-attach
* decomposed relative position bias added to the non-CLS attention block
* residual pooling: pooled q added to the attention output, CLS excluded
  (``residual_with_cls_embed=False``)
* channel expansion inside attention at Q-pooling blocks
  (``proj_after_attn=True``): the skip path projects the norm1-ed input
* skip max-pool with kernel = stride+1, padding = kernel//2
* final LayerNorm; classifier consumes ``x[:, 0]``

Reference behavior: /root/reference/video_backbone/TSP/models/backbone.py:46-50
loads torchvision ``mvit_v2_s``; TSPmodel.py:70-85 strips its head.
"""

import math

import torch
from torch import nn


class Pool(nn.Module):
    def __init__(self, head_dim, kernel, stride):
        super().__init__()
        padding = [k // 2 for k in kernel]
        self.pool = nn.Conv3d(head_dim, head_dim, kernel, stride=stride,
                              padding=padding, groups=head_dim, bias=False)
        self.norm_act = nn.Sequential(nn.LayerNorm(head_dim, eps=1e-5))

    def forward(self, x, thw):
        # x: (B, H, 1+L, D); CLS bypasses pooling
        B, H, N, D = x.shape
        cls_tok, grid = torch.tensor_split(x, indices=(1,), dim=2)
        grid = grid.transpose(2, 3).reshape(B * H, D, *thw)
        grid = self.pool(grid)
        T, Hh, W = grid.shape[2:]
        grid = grid.reshape(B, H, D, -1).transpose(2, 3)
        x = torch.cat((cls_tok, grid), dim=2)
        x = self.norm_act(x)
        return x, (T, Hh, W)


def _add_rel_pos(attn, q, q_thw, k_thw, rel_pos_h, rel_pos_w, rel_pos_t):
    q_t, q_h, q_w = q_thw
    k_t, k_h, k_w = k_thw

    def dist(q_n, k_n):
        q_ratio = max(k_n / q_n, 1.0)
        k_ratio = max(q_n / k_n, 1.0)
        d = (torch.arange(q_n)[:, None] * q_ratio
             - torch.arange(k_n)[None, :] * k_ratio)
        return (d + (k_n - 1) * k_ratio).long()

    Rh = rel_pos_h[dist(q_h, k_h)]
    Rw = rel_pos_w[dist(q_w, k_w)]
    Rt = rel_pos_t[dist(q_t, k_t)]

    B, n_head, _, dim = q.shape
    r_q = q[:, :, 1:].reshape(B, n_head, q_t, q_h, q_w, dim)
    rel_h = torch.einsum('bythwc,hkc->bythwk', r_q, Rh)
    rel_w = torch.einsum('bythwc,wkc->bythwk', r_q, Rw)
    rel_t = torch.einsum('bythwc,tkc->bythwk', r_q, Rt)
    rel = (rel_t[..., :, None, None]
           + rel_h[..., None, :, None]
           + rel_w[..., None, None, :]).reshape(
               B, n_head, q_t * q_h * q_w, k_t * k_h * k_w)
    attn[:, :, 1:, 1:] += rel
    return attn


class MultiscaleAttention(nn.Module):
    def __init__(self, in_ch, out_ch, heads, q_stride, kv_stride,
                 input_size):
        super().__init__()
        self.heads = heads
        self.head_dim = out_ch // heads
        self.out_ch = out_ch
        self.scaler = 1.0 / math.sqrt(self.head_dim)
        self.qkv = nn.Linear(in_ch, 3 * out_ch)
        self.project = nn.Sequential(nn.Linear(out_ch, out_ch))
        self.pool_q = Pool(self.head_dim, (3, 3, 3), q_stride)
        self.pool_k = Pool(self.head_dim, (3, 3, 3), kv_stride)
        self.pool_v = Pool(self.head_dim, (3, 3, 3), kv_stride)
        t, s = input_size[0], max(input_size[1:])
        q_size = s // q_stride[1]
        kv_size = s // kv_stride[1]
        sp = 2 * max(q_size, kv_size) - 1
        self.rel_pos_h = nn.Parameter(torch.zeros(sp, self.head_dim))
        self.rel_pos_w = nn.Parameter(torch.zeros(sp, self.head_dim))
        self.rel_pos_t = nn.Parameter(torch.zeros(2 * t - 1, self.head_dim))

    def forward(self, x, thw):
        B, N, _ = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, self.head_dim)
        q, k, v = qkv.transpose(1, 3).unbind(dim=2)     # (B, H, N, D)
        q, q_thw = self.pool_q(q, thw)
        k, k_thw = self.pool_k(k, thw)
        v, _ = self.pool_v(v, thw)
        attn = torch.matmul(self.scaler * q, k.transpose(2, 3))
        attn = _add_rel_pos(attn, q, q_thw, k_thw,
                            self.rel_pos_h, self.rel_pos_w, self.rel_pos_t)
        attn = attn.softmax(dim=-1)
        x = torch.matmul(attn, v)
        x[:, :, 1:, :] += q[:, :, 1:, :]       # residual pool, no CLS
        x = x.transpose(1, 2).reshape(B, -1, self.out_ch)
        return self.project(x), q_thw


class MultiscaleBlock(nn.Module):
    def __init__(self, in_ch, out_ch, heads, q_stride, kv_stride,
                 input_size, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(in_ch, eps=1e-5)
        self.norm2 = nn.LayerNorm(out_ch, eps=1e-5)
        self.attn = MultiscaleAttention(in_ch, out_ch, heads, q_stride,
                                        kv_stride, input_size)
        hidden = int(out_ch * mlp_ratio)
        # torchvision MLP: Linear, GELU, Dropout, Linear, Dropout
        self.mlp = nn.Sequential(nn.Linear(out_ch, hidden), nn.GELU(),
                                 nn.Dropout(0.0), nn.Linear(hidden, out_ch),
                                 nn.Dropout(0.0))
        self.project = (nn.Linear(in_ch, out_ch)
                        if in_ch != out_ch else None)
        self.pool_skip = None
        self.q_stride = q_stride
        if max(q_stride) > 1:
            kernel = [s + 1 if s > 1 else s for s in q_stride]
            pad = [k // 2 for k in kernel]
            self.pool_skip = nn.MaxPool3d(kernel, stride=q_stride,
                                          padding=pad)

    def _skip_pool(self, x, thw):
        if self.pool_skip is None:
            return x
        B, N, C = x.shape
        cls_tok, grid = torch.tensor_split(x, indices=(1,), dim=1)
        grid = grid.transpose(1, 2).reshape(B, C, *thw)
        grid = self.pool_skip(grid)
        grid = grid.reshape(B, C, -1).transpose(1, 2)
        return torch.cat((cls_tok, grid), dim=1)

    def forward(self, x, thw):
        x_norm1 = self.norm1(x)
        x_attn, thw_new = self.attn(x_norm1, thw)
        # proj_after_attn=True: skip projects the normed input
        if self.project is not None:
            x = self.project(x_norm1)
        x = self._skip_pool(x, thw)
        x = x + x_attn
        x_norm2 = self.norm2(x)
        return x + self.mlp(x_norm2), thw_new


class PositionalEncoding(nn.Module):
    """v2 (rel_pos_embed=True): only the class token, no position tables."""

    def __init__(self, embed_size):
        super().__init__()
        self.class_token = nn.Parameter(torch.zeros(embed_size))

    def forward(self, x):
        cls = self.class_token.expand(x.size(0), -1).unsqueeze(1)
        return torch.cat((cls, x), dim=1)


class TorchMViT(nn.Module):
    """Generic MViT-v2 with torchvision state-dict names.

    ``specs``: list of (in_ch, out_ch, heads, q_stride, kv_stride) tuples —
    pass the same table as ``dvc_tpu.models.tsp.mvit_block_specs``.
    """

    def __init__(self, specs, embed_dim, input_size, num_classes=0):
        super().__init__()
        self.conv_proj = nn.Conv3d(3, embed_dim, (3, 7, 7),
                                   stride=(2, 4, 4), padding=(1, 3, 3))
        self.pos_encoding = PositionalEncoding(embed_dim)
        blocks = []
        size = list(input_size)
        for (in_ch, out_ch, heads, q_s, kv_s) in specs:
            blocks.append(MultiscaleBlock(in_ch, out_ch, heads, q_s, kv_s,
                                          size))
            size = [s // q for s, q in zip(size, q_s)]
        self.blocks = nn.ModuleList(blocks)
        self.norm = nn.LayerNorm(specs[-1][1], eps=1e-5)
        self.head = (nn.Linear(specs[-1][1], num_classes)
                     if num_classes else nn.Sequential())

    def forward(self, x, return_features=False):
        # x: (B, 3, T, H, W)
        x = self.conv_proj(x)
        thw = x.shape[2:]
        B, C = x.shape[:2]
        x = x.flatten(2).transpose(1, 2)
        x = self.pos_encoding(x)
        for block in self.blocks:
            x, thw = block(x, thw)
        x = self.norm(x)
        feats = x[:, 0]
        if return_features:
            return feats
        return self.head(feats)
